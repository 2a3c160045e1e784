"""Convert official LPIPS(alex) torch checkpoints to lpips_weights.npz.

Run this on a machine that has `torchvision` (AlexNet ImageNet weights) and
the `lpips` package (the trained linear heads), then copy the produced
`multimodalstudio_tpu/utils/lpips_weights.npz` into the repo. After that,
`utils/lpips_jax.py` scores the paper-faithful trained LPIPS
(reference protocol: scripts/evaluate_average_metrics.py:173-191).

This build environment has no network egress and no cached checkpoints, so
the script is expected to be run elsewhere; in-repo evaluation falls back
to the documented deterministic rand-init metric until the npz exists.
"""

from __future__ import annotations

import os
import sys

import numpy as np


def main() -> int:
    try:
        import lpips
        import torch  # noqa: F401
    except ImportError as e:
        print(f"needs torchvision+lpips with downloadable weights: {e}")
        return 1

    net = lpips.LPIPS(net="alex")
    out = {}
    convs = [m for m in net.net.modules() if m.__class__.__name__ == "Conv2d"]
    assert len(convs) == 5, f"expected 5 AlexNet convs, got {len(convs)}"
    for i, conv in enumerate(convs):
        # torch OIHW -> jax HWIO
        out[f"conv{i}_w"] = conv.weight.detach().numpy().transpose(2, 3, 1, 0)
        out[f"conv{i}_b"] = conv.bias.detach().numpy()
    for i, lin in enumerate([net.lin0, net.lin1, net.lin2, net.lin3, net.lin4]):
        w = lin.model[-1].weight.detach().numpy()  # [1, C, 1, 1]
        out[f"lin{i}_w"] = np.maximum(w.reshape(-1), 0.0)

    dest = os.path.join(
        os.path.dirname(__file__), "..", "multimodalstudio_tpu", "utils",
        "lpips_weights.npz",
    )
    np.savez(dest, **out)
    print(f"wrote {os.path.abspath(dest)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
