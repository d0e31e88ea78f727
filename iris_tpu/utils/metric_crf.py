"""CRF recovery metric + curve plots (parity: reference utils/metric_crf.py).

L2 between predicted and GT response curves; matplotlib plots matching
crf/plot.py's role.
"""

from __future__ import annotations

from argparse import ArgumentParser

import numpy as np


def crf_l2(crf_gt: np.ndarray, crf_pred: np.ndarray) -> float:
    return float(np.linalg.norm(np.asarray(crf_gt) - np.asarray(crf_pred)))


def plot_crfs(crf_pred, crf_gt, path: str) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    crf_pred = np.asarray(crf_pred)
    x = np.linspace(0, 1, crf_pred.shape[-1])
    fig, axes = plt.subplots(1, 3, figsize=(12, 4))
    for c, ax in enumerate(axes):
        if crf_gt is not None:
            gt = np.asarray(crf_gt)
            ax.plot(np.linspace(0, 1, gt.shape[-1]), gt[c], "b--",
                    label="GT")
        ax.plot(x, crf_pred[c], "r-", label="Pred.")
        ax.set_xlabel("Irradiance")
        ax.set_ylabel("LDR")
        ax.set_xlim(0, 1)
        ax.set_ylim(0, 1)
        ax.legend()
    fig.tight_layout()
    fig.savefig(path, dpi=100)
    plt.close(fig)


def plot_weights(w_pred, w_gt, path: str) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    w_pred = np.asarray(w_pred)
    fig, ax = plt.subplots(figsize=(6, 4))
    idx = np.arange(w_pred.size)
    ax.bar(idx - 0.2, w_pred.reshape(-1), width=0.4, label="Pred.")
    if w_gt is not None:
        ax.bar(idx + 0.2, np.asarray(w_gt).reshape(-1), width=0.4,
               label="GT")
    ax.legend()
    fig.tight_layout()
    fig.savefig(path, dpi=100)
    plt.close(fig)


def main(argv=None):
    parser = ArgumentParser()
    parser.add_argument("--crf_gt", type=str, required=True)
    parser.add_argument("--ckpt", type=str, required=True)
    parser.add_argument("--crf_basis", type=int, default=3)
    parser.add_argument("--plot", type=str, default=None)
    args = parser.parse_args(argv)

    from dataclasses import replace as dc_replace

    import jax.numpy as jnp

    from iris_tpu.models.crf import get_crf, init_emor_crf
    from iris_tpu.train.checkpoint import load_pytree

    crf_gt = np.load(args.crf_gt)
    ckpt = load_pytree(args.ckpt)
    crf = init_emor_crf(dim=args.crf_basis)
    crf = dc_replace(crf, weight=jnp.asarray(ckpt["crf_weight"]))
    crf_pred = np.asarray(get_crf(crf))
    print(f"L2: {crf_l2(crf_gt, crf_pred):.5f}")
    if args.plot:
        plot_crfs(crf_pred, crf_gt, args.plot)


if __name__ == "__main__":
    main()
