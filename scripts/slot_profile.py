"""Device-time attribution for the slot-grid op via jax.profiler.

Wall-clock slope probes through the axon tunnel disagree at the 2x level
(dispatch pipelining + async fetch); this measures DEVICE time per op from
the xplane trace instead. Runs K chained fwd+tang and value_and_grad
iterations, then prints the top ops by self time.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/slot_profile.py
Env: SLOT_N (default 16384), SLOT_K (default 8)
"""

from __future__ import annotations

import glob
import json
import os
import sys

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jaxcache")
sys.path.insert(0, "/root/repo")

from multimodalstudio_tpu.ops.pallas.slot_grid import (  # noqa: E402
    SlotGridSpec,
    make_table_init,
    slot_grid_lookup,
)

N = int(os.environ.get("SLOT_N", "16384"))
K = int(os.environ.get("SLOT_K", "8"))
SPEC = SlotGridSpec(num_levels=6, min_res=16, max_res=512, rows_per_level=2048)


@jax.jit
def run_fwd(x, table):
    acc = jnp.float32(0)
    for _ in range(K):
        enc, tenc = slot_grid_lookup(table, x, SPEC, with_tangents=True)
        v = jnp.sum(enc) * 1e-6 + jnp.sum(tenc) * 1e-9
        x = jnp.clip(x + v * 1e-12, 0.01, 0.97)
        acc = acc + v
    return x, acc


@jax.jit
def run_grad(x, table):
    acc = jnp.float32(0)
    for _ in range(K):
        def loss(t, q):
            enc, tenc = slot_grid_lookup(t, q, SPEC, with_tangents=True)
            return jnp.sum(enc * enc) + jnp.sum(tenc * tenc) * 1e-6

        val, gx = jax.value_and_grad(loss, argnums=1)(table, x)
        x = jnp.clip(x + gx * 1e-12, 0.01, 0.97)
        acc = acc + val
    return x, acc


def main():
    table = make_table_init(SPEC)(jax.random.PRNGKey(0)) * 1e3
    x = jax.random.uniform(jax.random.PRNGKey(1), (N, 3), minval=0.01, maxval=0.97)
    # warm both programs (compile outside the trace)
    r = run_fwd(x, table); float(r[1])
    r = run_grad(x, table); float(r[1])

    trace_dir = "/root/repo/prof_slot"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        r = run_fwd(x, table); float(r[1])
        r = run_grad(x, table); float(r[1])

    xplanes = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    if not xplanes:
        print("no xplane written"); return
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data(xplanes, "framework_op_stats^", {})
    obj = json.loads(data if isinstance(data, str) else data.decode())
    # obj[1] rows: [rank?, host?, opname, category?, ...]; dump raw rows
    rows = obj[1]["p"] if isinstance(obj, dict) else None
    out = os.path.join(trace_dir, "op_stats.json")
    with open(out, "w") as f:
        f.write(data if isinstance(data, str) else data.decode())
    print("op stats written to", out, flush=True)

    # quick parse: gviz table format {cols: [...], rows: [{c: [...]}]}
    try:
        table_obj = obj if isinstance(obj, dict) else json.loads(data)
        cols = [c.get("label") or c.get("id") for c in table_obj["cols"]]
        name_i = cols.index([c for c in cols if "name" in c.lower()][0])
        time_cands = [i for i, c in enumerate(cols) if "self" in c.lower()]
        time_i = time_cands[0] if time_cands else 1
        rows = []
        for rr in table_obj["rows"]:
            vals = [cell.get("v") for cell in rr["c"]]
            rows.append((vals[name_i], vals[time_i]))
        rows.sort(key=lambda t: -(t[1] or 0))
        tot = sum(t[1] or 0 for t in rows)
        print(f"total device self time: {tot/1e3:.3f} ms (K={K}, N={N})")
        for name, us in rows[:25]:
            print(f"  {us/1e3:9.3f} ms/trace  {us/1e3/K:8.4f} ms/op  {str(name)[:90]}")
    except Exception as e:  # noqa: BLE001
        print("gviz parse failed:", repr(e))
        print("inspect", out)


if __name__ == "__main__":
    main()
