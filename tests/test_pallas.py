"""Pallas kernel tests (interpreter mode on CPU)."""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental import pallas as pl


class TestVregScanGather:
    def test_interpret_mode_correct(self, monkeypatch):
        import multimodalstudio_tpu.ops.pallas.gather as G

        monkeypatch.setattr(
            pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)
        )
        table = jnp.asarray(np.random.rand(512).astype(np.float32))
        idx = jnp.asarray(np.random.randint(0, 512, 70000).astype(np.int32))
        out = G.vreg_scan_gather(table, idx)
        np.testing.assert_allclose(out, np.asarray(table)[np.asarray(idx)])
