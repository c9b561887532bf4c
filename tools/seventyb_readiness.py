"""70B readiness artifact (BASELINE configs[4]: Llama-3-70B SMT on a
v5p-64-class FSDP mesh; VERDICT r3 next #4). Three checks, all CPU-runnable
in CI time — no hardware, no materialized weights:

  (a) SELECTION SCALE — run the host-side matrix selection at real 70B
      dims from synthetic per_step_stats accumulators and time it (the
      vectorized top-k in smt/select.py must not be a minutes-long host
      stall at ~1M candidate blocks);
  (b) STEP LOWERING + MEMORY — AOT-lower and compile the int8 scan sparse
      step at FULL Llama-3-70B geometry (h=8192, f=28672, L=80, GQA 64/8,
      V=128256) over a virtual fsdp mesh using sharding-annotated
      jax.ShapeDtypeStruct args (nothing is allocated), and print XLA's
      per-device buffer-assignment bytes (compiled.memory_analysis());
  (c) PARTITION DIVISIBILITY — pure-arithmetic check that every
      PartitionSpec the state sharding rules emit divides the 70B dims on
      the candidate v5p-64 mesh factorizations (a dropped axis in
      mesh._fit means silent replication — caught here, not on the pod).

Run: python tools/seventyb_readiness.py [--skip-lower]
(tests/test_70b_readiness.py runs (a) at reduced depth and (c) in full.)

Reference mapping: the reference's 70B-scale path is ZeRO-3 partitioning
(deepspeed_helpers.py:533-572) — never exercised in its repo either; this
artifact is the TPU-native equivalent evidence, one level stronger (the
compiler's own memory accounting for the real step program).
"""
import json
import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")
import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax.numpy as jnp
import numpy as np

# --- Llama-3-70B geometry ---------------------------------------------------
H, F, V, L = 8192, 28672, 128256, 80
HQ, HKV, HD = 64, 8, 128
MODS = {"q_proj": (H, H), "k_proj": (HKV * HD, H), "v_proj": (HKV * HD, H),
        "o_proj": (H, H), "gate_proj": (F, H), "down_proj": (H, F),
        "up_proj": (F, H)}
RATIO = 0.0084  # the paper's headline sparsity (BASELINE north star)
BSZ, SEQ = 8, 2048


def selection_at_scale():
    """(a): host selection timing at 70B dims."""
    from sparse_matrix_tuning_tpu.config import SMTConfig
    from sparse_matrix_tuning_tpu.train.convert import compute_matrix_selection

    cfg = SMTConfig(matrix_sparsity=True, data_path=["x"],
                    model_name_or_path="x",
                    downsample_attention_blocks_ratio=RATIO,
                    downsample_mlp_blocks_ratio=RATIO,
                    saliency_accumulation="per_step_stats")
    rng = np.random.default_rng(0)
    acc, nblocks = {}, 0
    from sparse_matrix_tuning_tpu.models.llama import TARGET_MODULES
    for mod in TARGET_MODULES:
        o, i = MODS[mod]
        for l in range(L):
            acc[f"{l}.{mod}"] = rng.random((o // 256, i // 256), np.float32)
            nblocks += (o // 256) * (i // 256)
    all_2d = [(V, H), (V, H)] + [MODS[m] for m in MODS for _ in range(L)]
    t0 = time.perf_counter()
    selected = compute_matrix_selection(cfg, acc, all_2d)
    dt = time.perf_counter() - t0
    nsel = sum(len(v) for v in selected.values())
    print(f"(a) selection: {nblocks:,} candidate blocks -> {nsel:,} selected "
          f"in {dt:.2f}s host time")
    assert dt < 60, f"selection too slow at 70B scale: {dt:.1f}s"
    return {"candidate_blocks": nblocks, "selected_blocks": nsel,
            "seconds": round(dt, 3)}


def synth_plan(seed=0):
    from sparse_matrix_tuning_tpu.smt.plan import LinearPlan, SMTPlan

    rng = np.random.default_rng(seed)
    # ~0.84%+0.84% of total blocks spread like a real selection: weight
    # per-module counts by block count
    from sparse_matrix_tuning_tpu.models.llama import TARGET_MODULES
    total = sum((MODS[m][0] // 256) * (MODS[m][1] // 256) * L
                for m in TARGET_MODULES)
    budget = int(total * RATIO * 2)
    linears = {}
    for mod in TARGET_MODULES:
        o, i = MODS[mod]
        grid = (o // 256, i // 256)
        per_layer = max(1, round(budget * grid[0] * grid[1]
                                 / (total / L) / L / L))
        for l in range(L):
            picks = {(int(r), int(c)) for r, c in zip(
                rng.integers(0, grid[0], per_layer),
                rng.integers(0, grid[1], per_layer))}
            linears[f"{l}.{mod}"] = LinearPlan(mod, l, o, i,
                                               blocks=tuple(sorted(picks)))
    return SMTPlan(mode="matrix", linears=linears)


def abstract_state(plan, mesh, offload: bool = False):
    """The int8 scan sparse state at 70B dims as sharding-annotated
    ShapeDtypeStructs — layout mirrors scan_phase.build_scan_sparse_state
    with frozen_quant=int8 + head_quant=int8. offload=True mirrors
    convert.HostShards multi-process offload (round 5): the compute-dead
    stacked bf16 weights become (L, 1) placeholders — each process keeps
    its addressable shards in host RAM — cutting per-device HBM by the
    stacked bf16 footprint."""
    from sparse_matrix_tuning_tpu.parallel.mesh import state_shardings
    from sparse_matrix_tuning_tpu.train.scan_phase import stack_plan_indices

    idx = stack_plan_indices(plan, L)
    sds = jax.ShapeDtypeStruct
    stacked = {n: sds((L, H), jnp.bfloat16)
               for n in ("input_layernorm", "post_attention_layernorm")}
    for mod, (o, i) in MODS.items():
        stacked[mod] = sds((L, 1) if offload else (L, o, i), jnp.bfloat16)
    q = {mod: {"wq": sds((L, o, i), jnp.int8), "sw": sds((L, o), jnp.float32)}
         for mod, (o, i) in MODS.items()}
    trainable = {mod: sds((L, meta["rb"].shape[1], 256, 256), jnp.float32)
                 for mod, meta in idx.items()}
    state = {
        "params": {
            "embed_tokens": sds((V, H), jnp.bfloat16),
            # int8 head: the untied bf16 lm_head is compute-dead and
            # offloads with the layer weights (convert.offload_lm_head)
            "lm_head": sds((1,) if offload else (V, H), jnp.bfloat16),
            "norm": sds((H,), jnp.bfloat16),
            "layers_stacked": stacked,
        },
        "trainable": trainable,
        "base": dict(trainable),
        "idx": idx,  # tiny concrete int arrays (they shape the program)
        "m": dict(trainable), "v": dict(trainable),
        "count": sds((), jnp.int32), "step": sds((), jnp.int32),
        "q": q,
        "q_head": {"wq": sds((V, H), jnp.int8), "sw": sds((V,), jnp.float32)},
    }
    sh = state_shardings(state, mesh, plan_mode="matrix")

    def annotate(s, ns):
        if isinstance(s, jax.ShapeDtypeStruct):
            return jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=ns)
        return s  # concrete idx arrays pass through

    return jax.tree.map(annotate, state, sh), sh


def lower_70b_step(mesh_shape=(1, 8, 1), offload=False):
    """(b): AOT lower + compile the 70B scan sparse step; print XLA's
    per-device memory accounting. offload=True lowers the multi-process
    host-offload variant (round 5: stacked bf16 weights in per-process
    host RAM, VERDICT r4 next #7) — the per-device peak drops by the
    stacked bf16 footprint (~17.5 GB at 8-way)."""
    from jax.sharding import NamedSharding
    from sparse_matrix_tuning_tpu.config import SMTConfig
    from sparse_matrix_tuning_tpu.models.llama import LlamaConfig
    from sparse_matrix_tuning_tpu.parallel.mesh import (
        batch_pspec, make_mesh, set_compute_mesh)
    from sparse_matrix_tuning_tpu.smt.optimizer import make_lr_schedule
    from sparse_matrix_tuning_tpu.train.scan_phase import (
        build_scan_sparse_step)

    big = LlamaConfig(vocab_size=V, hidden_size=H, intermediate_size=F,
                      num_hidden_layers=L, num_attention_heads=HQ,
                      num_key_value_heads=HKV, max_position_embeddings=SEQ,
                      tie_word_embeddings=False)
    cfg = SMTConfig(matrix_sparsity=True, data_path=["x"],
                    model_name_or_path="x", dtype="bf16",
                    downsample_attention_blocks_ratio=RATIO,
                    downsample_mlp_blocks_ratio=RATIO,
                    sparse_gradient_checkpointing=True,
                    scan_layers="on", max_seq_len=SEQ, seq_buckets=[SEQ])
    mesh = make_mesh(mesh_shape)
    set_compute_mesh(mesh)
    plan = synth_plan()
    state, _ = abstract_state(plan, mesh, offload=offload)
    bsh = NamedSharding(mesh, batch_pspec())
    batch = {k: jax.ShapeDtypeStruct((BSZ, SEQ), jnp.int32, sharding=bsh)
             for k in ("input_ids", "labels", "attention_mask")}
    step = jax.jit(build_scan_sparse_step(
        cfg, big, plan, make_lr_schedule("constant", 1e-5, 0, 100)),
        donate_argnums=(0,))
    t0 = time.perf_counter()
    lowered = step.lower(state, batch)
    t_lower = time.perf_counter() - t0
    t0 = time.perf_counter()
    compiled = lowered.compile()
    t_compile = time.perf_counter() - t0
    ma = compiled.memory_analysis()
    gb = 1 / 2**30
    out = {
        "mesh": list(mesh_shape), "host_offload": offload,
        "lower_s": round(t_lower, 1), "compile_s": round(t_compile, 1),
        "per_device_gb": {
            "arguments": round(ma.argument_size_in_bytes * gb, 2),
            "outputs": round(ma.output_size_in_bytes * gb, 2),
            "temps": round(ma.temp_size_in_bytes * gb, 2),
            "aliased": round(ma.alias_size_in_bytes * gb, 2),
            "peak": round((ma.argument_size_in_bytes
                           + ma.output_size_in_bytes
                           + ma.temp_size_in_bytes
                           - ma.alias_size_in_bytes) * gb, 2),
        },
        "trainable_params": plan.trainable_params,
    }
    print(f"(b) 70B scan sparse step over mesh {mesh_shape}"
          f"{' + host offload' if offload else ''}: "
          f"lower {t_lower:.0f}s, compile {t_compile:.0f}s, per-device "
          f"{json.dumps(out['per_device_gb'])}")
    set_compute_mesh(None)
    return out


def warmup_state_bytes(fsdp_sizes=(4, 8)):
    """(d): per-device bytes of the SCAN WARM-UP state (grad_sum saliency)
    at 70B dims under the state sharding rules (VERDICT r4 next #2 /
    weak #2): the stacked (L, R, C) fp32 grad-sum accumulators carry their
    weight's sharding (parallel/mesh.py 'acc' specs), so per-device
    warm-up memory must scale DOWN with fsdp — replicated accumulators
    would be ~26 GB/device at 8B and ~260 GB at 70B (instant OOM; the
    reference keeps grad sums off the accelerator entirely,
    fine_tune.py:729-740). Pure arithmetic: ShapeDtypeStructs through
    state_shardings + NamedSharding.shard_shape."""
    from sparse_matrix_tuning_tpu.models.llama import TARGET_MODULES
    from sparse_matrix_tuning_tpu.parallel.mesh import (
        make_mesh, state_shardings)

    sds = jax.ShapeDtypeStruct
    stacked = {n: sds((L, H), jnp.float32)
               for n in ("input_layernorm", "post_attention_layernorm")}
    for mod, (o, i) in MODS.items():
        stacked[mod] = sds((L, o, i), jnp.float32)
    master = {"embed_tokens": sds((V, H), jnp.float32),
              "lm_head": sds((V, H), jnp.float32),
              "norm": sds((H,), jnp.float32),
              "layers_stacked": stacked}
    acc = {mod: sds((L,) + MODS[mod], jnp.float32) for mod in TARGET_MODULES}
    state = {"master": master, "m": master, "v": master, "acc": acc,
             "count": sds((), jnp.int32), "step": sds((), jnp.int32)}

    def per_device_gb(mesh, group):
        sh = state_shardings({group[0]: state[group[0]]}, mesh, None)
        total = 0
        for leaf, ns in zip(jax.tree.leaves(state[group[0]]),
                            jax.tree.leaves(sh)):
            shard = ns.shard_shape(leaf.shape)
            total += int(np.prod(shard)) * leaf.dtype.itemsize
        return total / 2**30

    out = {}
    for f_ in fsdp_sizes:
        mesh = make_mesh((1, f_, 1), devices=jax.devices()[:f_])
        out[f"fsdp{f_}"] = {
            "acc_gb": round(per_device_gb(mesh, ["acc"]), 2),
            "master_gb": round(per_device_gb(mesh, ["master"]), 2),
            "adam_gb": round(2 * per_device_gb(mesh, ["m"]), 2),
        }
    a, b = [out[f"fsdp{f_}"]["acc_gb"] for f_ in fsdp_sizes]
    assert b < a * 0.75, \
        f"grad_sum accumulators do not shard down with fsdp: {out}"
    print(f"(d) warm-up state per-device GB at 70B (grad_sum): "
          f"{json.dumps(out)}")
    return out


def export_at_scale(Lp=2):
    """(e): merged_params_from_scan at 70B WIDTHS, reduced depth Lp,
    extrapolated x(L/Lp) — the trained-block scatter is vectorized per
    layer (scan_phase._scatter_trained_layer) and layer slices stream
    through _host_global one at a time, so time is linear in depth and
    peak host RAM is bounded by output + one slice (VERDICT r4 next #6;
    reference export is a cheap in-place scatter, smt.py:416-457)."""
    import types
    from sparse_matrix_tuning_tpu.smt.plan import SMTPlan
    from sparse_matrix_tuning_tpu.train.scan_phase import (
        merged_params_from_scan, stack_plan_indices)

    full = synth_plan()
    linears = {k: lp for k, lp in full.linears.items() if lp.layer < Lp}
    plan = SMTPlan(mode="matrix", linears=linears)
    idx = stack_plan_indices(plan, Lp)
    key = jax.random.PRNGKey(0)
    stacked, trainable = {}, {}
    slice_bytes = 0
    for mod, (o, i) in MODS.items():
        key, sub = jax.random.split(key)
        stacked[mod] = jnp.zeros((Lp, o, i), jnp.bfloat16)
        slice_bytes += o * i * 2
        if mod in idx:
            n = idx[mod]["rb"].shape[1]
            trainable[mod] = jax.random.normal(sub, (Lp, n, 256, 256),
                                               jnp.float32)
    stacked["input_layernorm"] = jnp.ones((Lp, H), jnp.bfloat16)
    state = {"params": {"layers_stacked": stacked,
                        "embed_tokens": jnp.zeros((V, H), jnp.bfloat16),
                        "norm": jnp.ones((H,), jnp.bfloat16)},
             "idx": idx, "trainable": trainable}
    mcfg = types.SimpleNamespace(num_hidden_layers=Lp)
    # baseline: the unavoidable device->host movement of the same bytes
    # (export must materialise every weight on host regardless of SMT) —
    # measured so the scatter/merge OVERHEAD is what the gate judges, not
    # this box's single-core memcpy bandwidth
    from sparse_matrix_tuning_tpu.train.scan_phase import _host_global
    t0 = time.perf_counter()
    for mod in stacked:
        for l in range(Lp):
            _host_global(stacked[mod][l])
    t_copy = time.perf_counter() - t0
    t0 = time.perf_counter()
    params = merged_params_from_scan(state, plan, mcfg)
    dt = time.perf_counter() - t0
    # spot-check one scattered block round-trips
    mod = sorted(idx)[0]
    meta = idx[mod]
    l = 0
    j = int(np.argmax(np.asarray(meta["valid"][l])))
    rb, cb = int(meta["rb"][l, j]), int(meta["cb"][l, j])
    w = params["layers"]["0"][mod]
    got = w[rb * 256:(rb + 1) * 256, cb * 256:(cb + 1) * 256]
    np.testing.assert_allclose(
        np.asarray(got, np.float32),
        np.asarray(trainable[mod][l, j].astype(jnp.bfloat16), np.float32))
    overhead = max(dt - t_copy, 0.0)
    est_overhead = overhead * (L / Lp)
    out_bytes = slice_bytes * L + 2 * V * H * 2
    gbps = slice_bytes * Lp / max(t_copy, 1e-9) / 1e9
    res = {"depth_measured": Lp, "seconds_measured": round(dt, 2),
           "seconds_copy_baseline": round(t_copy, 2),
           "merge_overhead_s": round(overhead, 2),
           "merge_overhead_at_70b_depth_est_s": round(est_overhead, 1),
           "host_copy_gbps_this_box": round(gbps, 2),
           "host_bytes_output_gb": round(out_bytes / 2**30, 1),
           # streaming grain = one (O, I) module-layer slice (_host_global
           # per layer, not per (L, O, I) stack)
           "host_bytes_transient_gb": round(
               max(o * i * 2 for o, i in MODS.values()) / 2**30, 2)}
    # the gate judges the MERGE overhead (the per-block Python scatter this
    # replaced was the bottleneck, VERDICT r4 weak #6) — the device->host
    # copy itself is this box's single-core memcpy bandwidth (~1 GB/s here
    # vs >=10 GB/s on a real TPU host) and is reported, not gated
    assert est_overhead < 60, \
        f"70B export merge overhead too slow: est {est_overhead:.0f}s"
    print(f"(e) export at 70B widths: {json.dumps(res)}")
    return res


# candidate v5p-64-class factorizations (data, fsdp, tensor)
CANDIDATE_MESHES = [(1, 64, 1), (2, 32, 1), (1, 32, 2), (1, 16, 4),
                    (4, 16, 1), (1, 8, 8)]


def check_divisibility(mesh_shapes=CANDIDATE_MESHES):
    """(c): every PartitionSpec the sharding rules emit must divide the 70B
    dims — otherwise mesh._fit silently REPLICATES that leaf (correct but
    memory-catastrophic at 70B). Pure arithmetic, no devices needed."""
    failures = []
    for (d, f_, t) in mesh_shapes:
        batch_div = d * f_
        checks = [
            ("embed_tokens (V,H) P(fsdp,tensor)", V % f_ == 0 and H % t == 0),
            ("lm_head/q_head (V,H) P(tensor,fsdp)", V % t == 0 and H % f_ == 0),
            ("global batch divisible", (BSZ * batch_div) % batch_div == 0),
            ("trainable (L,n,256,256) P(-,-,fsdp,-)", 256 % f_ == 0),
            ("q_head sw (V,) P(tensor)", V % t == 0),
        ]
        for mod, (o, i) in MODS.items():
            col = mod in ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj")
            po, pi = (t, f_) if col else (f_, t)
            checks.append((f"{mod} ({o},{i})", o % po == 0 and i % pi == 0))
            checks.append((f"{mod} int8 sw ({o},)", o % po == 0))
        # attention head divisibility for the fullk shard_map path
        checks.append(("heads % tensor", HQ % t == 0 and HKV % t == 0))
        for name, ok in checks:
            if not ok:
                failures.append(f"mesh {(d, f_, t)}: {name}")
    status = "all divide" if not failures else f"FAILURES: {failures}"
    print(f"(c) partition divisibility over {len(mesh_shapes)} candidate "
          f"meshes: {status}")
    # (2,32,1)-style meshes: trainable dim 256 % 32 == 0 holds; fsdp=64
    # also divides 256. The one real constraint surfaced: fsdp must divide
    # 256 for the intra-block sharding — candidate meshes all satisfy it.
    return failures


def main():
    res = {"selection": selection_at_scale(),
           "divisibility_failures": check_divisibility(),
           "warmup_state_per_device_gb": warmup_state_bytes(),
           "export": export_at_scale()}
    assert not res["divisibility_failures"], res["divisibility_failures"]
    if "--skip-lower" not in sys.argv:
        res["lowering"] = lower_70b_step()
        # round 5: the multi-process host-offload variant (VERDICT r4
        # next #7) — per-device peak without the compute-dead bf16 stack
        res["lowering_offload"] = lower_70b_step(offload=True)
    print("SEVENTYB_READINESS " + json.dumps(res))


if __name__ == "__main__":
    main()
