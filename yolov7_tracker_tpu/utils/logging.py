"""Training/tracking observability.

The reference logs through TensorBoard scalars + optional W&B artifacts
(train.py:433-439, utils/wandb_logging/). Zero-egress equivalent: a
JSONL metrics stream (one object per step/epoch, trivially greppable and
plottable) plus matplotlib summaries. TensorBoard event writing is used
when the `tensorboardX`/`tensorboard` packages happen to be present.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricsLogger:
    def __init__(self, run_dir: str, filename: str = "metrics.jsonl"):
        os.makedirs(run_dir, exist_ok=True)
        self.path = os.path.join(run_dir, filename)
        self._tb = None
        try:  # optional TensorBoard
            from torch.utils.tensorboard import SummaryWriter  # type: ignore

            self._tb = SummaryWriter(os.path.join(run_dir, "tb"))
        except Exception:
            pass

    def log(self, step: int, scalars: Dict[str, float], prefix: str = ""):
        rec = {"step": int(step), "time": time.time()}
        rec.update({
            (f"{prefix}/{k}" if prefix else k): float(v)
            for k, v in scalars.items()
        })
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            for k, v in rec.items():
                if k not in ("step", "time"):
                    self._tb.add_scalar(k, v, step)

    def close(self):
        if self._tb is not None:
            self._tb.close()


def plot_results(jsonl_path: str, out_png: Optional[str] = None):
    """results.png analogue (utils/plots.py plot_results)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rows = [json.loads(l) for l in open(jsonl_path)]
    keys = sorted({k for r in rows for k in r} - {"step", "time"})
    if not keys:
        return None
    n = len(keys)
    fig, axes = plt.subplots(
        (n + 3) // 4, min(n, 4), figsize=(4 * min(n, 4), 3 * ((n + 3) // 4))
    )
    axes = list(getattr(axes, "flat", [axes]))
    for ax, k in zip(axes, keys):
        xs = [r["step"] for r in rows if k in r]
        ys = [r[k] for r in rows if k in r]
        ax.plot(xs, ys, ".-", markersize=2)
        ax.set_title(k, fontsize=9)
    fig.tight_layout()
    out_png = out_png or jsonl_path.replace(".jsonl", ".png")
    fig.savefig(out_png, dpi=120)
    plt.close(fig)
    return out_png


def plot_pr_curve(px, py, ap, out_png: str, names=()):
    """PR-curve figure (utils/plots.py plot_pr_curve analogue)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    fig, ax = plt.subplots(1, 1, figsize=(9, 6))
    py = np.stack(py, axis=1)
    for i, y in enumerate(py.T):
        label = f"{names[i] if i < len(names) else i} {ap[i, 0]:.3f}"
        ax.plot(px, y, linewidth=1, label=label)
    ax.plot(px, py.mean(1), linewidth=3, color="blue",
            label=f"all classes {ap[:, 0].mean():.3f} mAP@0.5")
    ax.set_xlabel("Recall")
    ax.set_ylabel("Precision")
    ax.legend(fontsize=7)
    fig.savefig(out_png, dpi=200)
    plt.close(fig)
    return out_png


def profile_trace(log_dir: str):
    """Context manager: captures a jax.profiler trace (xprof), replacing
    the reference's thop/TracedModel profiling (utils/torch_utils.py:96)."""
    import jax

    return jax.profiler.trace(log_dir)


def plot_confusion_matrix(matrix, out_png: str, names=()):
    """Confusion-matrix heatmap (utils/metrics.py ConfusionMatrix.plot
    analogue, without the seaborn dependency)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    m = np.asarray(matrix, float)
    norm = m / np.maximum(m.sum(0, keepdims=True), 1e-9)
    fig, ax = plt.subplots(1, 1, figsize=(8, 7))
    im = ax.imshow(norm, cmap="Blues", vmin=0, vmax=1)
    n = m.shape[0]
    labels = [str(names[i]) if i < len(names) else str(i)
              for i in range(n - 1)] + ["background"]
    ax.set_xticks(range(n)); ax.set_xticklabels(labels, rotation=90,
                                                fontsize=6)
    ax.set_yticks(range(n)); ax.set_yticklabels(labels, fontsize=6)
    ax.set_xlabel("True"); ax.set_ylabel("Predicted")
    fig.colorbar(im)
    fig.savefig(out_png, dpi=200, bbox_inches="tight")
    plt.close(fig)
    return out_png
