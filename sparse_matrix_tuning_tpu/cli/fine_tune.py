"""Training entry point — the `deepspeed fine_tune.py --flags` equivalent
(reference deepspeed/fine_tune.py:867-1081 + deepspeed/README.md:36-63):

  python -m sparse_matrix_tuning_tpu.cli.fine_tune \
      --model_name_or_path /path/to/llama-3-8b \
      --data_path /path/to/commonsense_170k.json \
      --matrix_sparsity --full_ft_steps 100 \
      --downsample_attention_blocks_ratio 0.0084 \
      --downsample_mlp_blocks_ratio 0.0084 \
      --output_dir /path/to/out

model_name_or_path must be a local HF checkpoint dir (TPU pods have no hub
egress; pre-download with huggingface-cli).
"""

from __future__ import annotations

import os
import sys



def main(argv=None):
    from sparse_matrix_tuning_tpu.config import parse_args
    cfg = parse_args(argv)

    import jax
    if os.environ.get("SMT_DISTRIBUTED") == "1":
        # multi-host pod: one process per host, coordinator via the standard
        # JAX env vars (replaces the deepspeed launcher's process group)
        jax.distributed.initialize()
    from sparse_matrix_tuning_tpu.data.sft import make_supervised_data, num_batches
    from sparse_matrix_tuning_tpu.models.hf_io import (
        load_hf_config, load_hf_params, load_hf_tokenizer,
    )
    from sparse_matrix_tuning_tpu.parallel.mesh import make_mesh
    from sparse_matrix_tuning_tpu.train.trainer import SMTTrainer
    from sparse_matrix_tuning_tpu.train.checkpoint import restore_checkpoint
    from sparse_matrix_tuning_tpu.utils.jax_cache import enable_compilation_cache
    from sparse_matrix_tuning_tpu.utils.logging import print_rank_0, set_random_seed

    enable_compilation_cache()
    set_random_seed(cfg.seed)
    print_rank_0(f"[config]\n{cfg.to_json()}")

    if not os.path.isdir(cfg.model_name_or_path):
        raise FileNotFoundError(
            f"{cfg.model_name_or_path}: model_name_or_path must be a local "
            "HF checkpoint directory (no hub egress on TPU pods)")

    tokenizer = load_hf_tokenizer(cfg.model_name_or_path, cfg.max_seq_len,
                                  cfg.add_eot_token)
    model_cfg = load_hf_config(cfg.model_name_or_path)
    if cfg.dropout and cfg.dropout > 0:
        # reference configure_dropout (deepspeed_helpers.py:577-583):
        # Llama-family exposes attention_dropout
        import dataclasses as _dc
        model_cfg = _dc.replace(model_cfg, attention_dropout=cfg.dropout)
    params = None
    if not cfg.sparse_from_plan:
        params = load_hf_params(cfg.model_name_or_path, model_cfg,
                                dtype=cfg.param_dtype)

    train_ds, eval_ds = make_supervised_data(
        cfg.data_path[0], tokenizer, cfg.max_seq_len, cfg.eval_set_ratio, cfg.seed)
    print_rank_0(f"Training data size {len(train_ds)}, "
                 f"validation data set {len(eval_ds)}")

    n_dev = len(jax.devices())
    mesh = make_mesh(cfg.mesh_shape) if (n_dev > 1 or cfg.mesh_shape) else None
    # must match trainer.fit's batch math: one optimizer step consumes
    # per_device x devices x accumulation examples
    global_bs = (cfg.per_device_ft_batch_size * n_dev
                 * cfg.gradient_accumulation_steps)
    steps_per_epoch = num_batches(len(train_ds), global_bs)
    total_steps = cfg.num_ft_epochs * steps_per_epoch

    if cfg.sparse_from_plan:
        # sparse-ONLY continuation: warm-up + selection ran elsewhere and
        # produced this plan; quantize-on-load streams the base checkpoint
        # into the int8 scan state (full weights never co-reside on device)
        from sparse_matrix_tuning_tpu.smt.plan import SMTPlan
        with open(cfg.sparse_from_plan) as f:
            plan = SMTPlan.from_json(f.read())
        trainer = SMTTrainer.sparse_scan_from_hf(
            cfg, cfg.model_name_or_path, plan, total_steps,
            model_cfg=model_cfg)
    else:
        trainer = SMTTrainer(cfg, model_cfg, params, total_steps, mesh=mesh)
        del params
    if cfg.resume_from:
        restore_checkpoint(cfg.resume_from, trainer)
        print_rank_0(f"[resume] from {cfg.resume_from} at step {trainer.step} "
                     f"phase {trainer.phase}")

    history = trainer.fit(train_ds, eval_ds, tokenizer.pad_token_id,
                          tokenizer=tokenizer)
    print_rank_0(f"training_loss_list: {history['train_loss'][-20:]}")
    print_rank_0(f"eval_loss_list: {history['eval_loss']}")
    print_rank_0(f"ppl_list: {history['ppl']}")
    return history


if __name__ == "__main__":
    main(sys.argv[1:])
