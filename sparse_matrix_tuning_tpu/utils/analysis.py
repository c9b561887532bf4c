"""Saliency-distribution analysis artifact.

Reference analyze_gradient_distribution (smt_helper.py:14-38): histogram of
per-block saliency per module type, saved as a PNG in the output dir when
--do_gradient_distribution_analysis is set (hooked at smt_helper.py:121-122).
"""

from __future__ import annotations

import os
from collections import defaultdict
from typing import Dict, Mapping

import numpy as np


def analyze_gradient_distribution(stats: Mapping, output_dir: str) -> str:
    """stats: {(module, layer): block-stat array} (matrix) or
    {(module, layer): per-channel array} (channel). Writes
    gradient_histograms_{modules}.png and returns the path."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    per_module: Dict[str, list] = defaultdict(list)
    for (module, _layer), arr in stats.items():
        per_module[module].extend(np.asarray(arr).reshape(-1).tolist())

    n_keys = len(per_module)
    n_cols = 3
    n_rows = (n_keys + n_cols - 1) // n_cols
    fig, axes = plt.subplots(n_rows, n_cols, figsize=(15, 5 * n_rows),
                             squeeze=False)
    axes = axes.flatten()
    for ax, (module, values) in zip(axes, per_module.items()):
        ax.hist(np.asarray(values), bins=150, alpha=0.7, edgecolor="black")
        ax.set_xlabel("Gradient Magnitude", fontsize=10)
        ax.set_ylabel("Frequency", fontsize=10)
        ax.set_title(module)
    for i in range(n_keys, len(axes)):
        axes[i].axis("off")

    key_string = "_".join(per_module.keys())
    os.makedirs(output_dir, exist_ok=True)
    path = os.path.join(output_dir, f"gradient_histograms_{key_string}.png")
    plt.tight_layout()
    plt.savefig(path, dpi=150, bbox_inches="tight")
    plt.close(fig)
    return path
