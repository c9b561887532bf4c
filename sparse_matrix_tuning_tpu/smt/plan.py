"""SMTPlan — the static description of what is trainable after conversion.

The reference mutates the torch module tree in place: it freezes whole
tensors (reference deepspeed/smt/smt.py:641-745), swaps nn.Linear for
LinearLayer_MatrixSparsity (smt.py:83-179) and keeps a per-module
`index_list`. In JAX the equivalent is a *plan*: a static, serializable
map (module, layer) -> selected block/channel indices. The plan drives

  * gather:  dense param pytree -> trainable pytree (the only thing the
             optimizer ever sees; state is proportional to sparsity),
  * scatter: trainable pytree -> written back into the dense weights
             (once per optimizer step, into donated buffers — the
             reference re-scatters on every forward, smt.py:331-341),
  * the custom_vjp sparse linears (which blocks get gradients).

Keys are "{layer}.{module}" strings so the trainable pytree is a flat
dict that jax treats as an ordinary pytree.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Dict, List, Mapping, Tuple

import jax
import jax.numpy as jnp
import numpy as np

BLOCK = 256

Key = Tuple[str, int]  # (module_name, layer_number)


def key_str(module: str, layer: int) -> str:
    return f"{layer}.{module}"


def parse_key(s: str) -> Key:
    layer, module = s.split(".", 1)
    return module, int(layer)


@dataclass(frozen=True)
class LinearPlan:
    """Selection for one target linear weight of shape (out_dim, in_dim)."""
    module: str
    layer: int
    out_dim: int
    in_dim: int
    # matrix mode: [(row_block, col_block), ...] in descending saliency order
    blocks: Tuple[Tuple[int, int], ...] = ()
    # channel mode: selected INPUT channels (columns of W). NOTE: this is a
    # deliberate fix of the reference, which indexes *rows* of W with
    # input-channel indices (smt.py:199-210) — coherent only for square
    # layers. See tests/test_channel.py for the documented deviation.
    channels: Tuple[int, ...] = ()

    def __post_init__(self):
        for rb, cb in self.blocks:
            if not (0 <= rb < self.out_dim // BLOCK and 0 <= cb < self.in_dim // BLOCK):
                raise ValueError(
                    f"block ({rb},{cb}) out of range for {self.module}.{self.layer} "
                    f"({self.out_dim}x{self.in_dim})")
        for c in self.channels:
            if not 0 <= c < self.in_dim:
                raise ValueError(f"channel {c} out of range for in_dim {self.in_dim}")

    @property
    def n_blocks(self) -> int:
        return len(self.blocks)

    @property
    def n_channels(self) -> int:
        return len(self.channels)

    @property
    def trainable_params(self) -> int:
        if self.blocks:
            return self.n_blocks * BLOCK * BLOCK
        return self.n_channels * self.out_dim

    def row_blocks(self) -> np.ndarray:
        return np.array([rb for rb, _ in self.blocks], dtype=np.int32)

    def col_blocks(self) -> np.ndarray:
        return np.array([cb for _, cb in self.blocks], dtype=np.int32)


@dataclass
class SMTPlan:
    """mode: 'matrix' (256x256 blocks) or 'channel' (input channels)."""
    mode: str
    linears: Dict[str, LinearPlan] = field(default_factory=dict)

    # -- construction ---------------------------------------------------------

    @classmethod
    def from_selection(cls, mode: str,
                       selected: Mapping[Key, list],
                       dims: Mapping[Key, Tuple[int, int]]) -> "SMTPlan":
        """selected: output of select_submatrices / select_channels.
        dims: {(module, layer): (out_dim, in_dim)} actual weight shapes."""
        linears = {}
        for (module, layer), idx in selected.items():
            if not idx:
                continue
            out_dim, in_dim = dims[(module, layer)]
            if mode == "matrix":
                lp = LinearPlan(module, layer, out_dim, in_dim,
                                blocks=tuple((int(r), int(c)) for r, c in idx))
            elif mode == "channel":
                lp = LinearPlan(module, layer, out_dim, in_dim,
                                channels=tuple(int(c) for c in idx))
            else:
                raise ValueError(f"unknown mode {mode!r}")
            linears[key_str(module, layer)] = lp
        return cls(mode=mode, linears=linears)

    # -- accounting -----------------------------------------------------------

    @property
    def trainable_params(self) -> int:
        return sum(lp.trainable_params for lp in self.linears.values())

    def get(self, module: str, layer: int) -> LinearPlan | None:
        return self.linears.get(key_str(module, layer))

    # -- gather / scatter -------------------------------------------------------

    def gather(self, layer_params: Mapping[str, Mapping[str, jax.Array]],
               dtype=jnp.float32) -> Dict[str, jax.Array]:
        """Extract the trainable tensor per planned linear.

        layer_params: params["layers"], i.e. {str(layer): {module: (O, I)}}.
        matrix mode -> (n_blocks, 256, 256); channel mode -> (out_dim, n_ch).
        Cast to `dtype` (fp32 master copies by default — the blocks are tiny,
        so full-precision trainables cost ~nothing and improve Adam).
        """
        out = {}
        for ks, lp in self.linears.items():
            w = layer_params[str(lp.layer)][lp.module]
            if self.mode == "matrix":
                # single vectorised gather over the (RB, 256, CB, 256) view
                # (a per-block slice loop would emit thousands of ops at
                # 70B-scale block counts)
                w4 = w.reshape(lp.out_dim // BLOCK, BLOCK,
                               lp.in_dim // BLOCK, BLOCK)
                rb = jnp.asarray(lp.row_blocks())
                cb = jnp.asarray(lp.col_blocks())
                out[ks] = w4[rb, :, cb, :].astype(dtype)  # (n, 256, 256)
            else:
                cols = jnp.asarray(np.array(lp.channels, dtype=np.int32))
                out[ks] = jnp.take(w, cols, axis=1).astype(dtype)
        return out

    def scatter(self, layer_params, trainable: Mapping[str, jax.Array]):
        """Write trainable values back into the dense weights.

        Returns a new params["layers"] mapping (functional update; donate the
        old buffers at the jit boundary for an in-place write).
        """
        new_layers = {k: dict(v) for k, v in layer_params.items()}
        for ks, lp in self.linears.items():
            w = new_layers[str(lp.layer)][lp.module]
            if getattr(w, "ndim", 2) != 2:
                # zero-size placeholder: the dense weight lives on host
                # (train/convert.py offload_frozen_to_host) — nothing to
                # keep current on device
                continue
            t = trainable[ks].astype(w.dtype)
            if self.mode == "matrix":
                w4 = w.reshape(lp.out_dim // BLOCK, BLOCK,
                               lp.in_dim // BLOCK, BLOCK)
                rb = jnp.asarray(lp.row_blocks())
                cb = jnp.asarray(lp.col_blocks())
                w = w4.at[rb, :, cb, :].set(t).reshape(w.shape)
            else:
                cols = jnp.asarray(np.array(lp.channels, dtype=np.int32))
                w = w.at[:, cols].set(t)
            new_layers[str(lp.layer)][lp.module] = w
        return new_layers

    # -- (de)serialization --------------------------------------------------------

    def to_json(self) -> str:
        return json.dumps({
            "mode": self.mode,
            "linears": {
                ks: {
                    "module": lp.module, "layer": lp.layer,
                    "out_dim": lp.out_dim, "in_dim": lp.in_dim,
                    "blocks": [list(b) for b in lp.blocks],
                    "channels": list(lp.channels),
                } for ks, lp in self.linears.items()
            },
        }, indent=1)

    @classmethod
    def from_json(cls, text: str) -> "SMTPlan":
        raw = json.loads(text)
        linears = {
            ks: LinearPlan(d["module"], d["layer"], d["out_dim"], d["in_dim"],
                           blocks=tuple(tuple(b) for b in d["blocks"]),
                           channels=tuple(d["channels"]))
            for ks, d in raw["linears"].items()
        }
        return cls(mode=raw["mode"], linears=linears)

    def fingerprint(self) -> str:
        """Stable digest for cross-host agreement checks (replaces the
        reference's file-broadcast sync, deepspeed_helpers.py:177-200)."""
        import hashlib
        return hashlib.sha256(self.to_json().encode()).hexdigest()
