"""Multi-host DCN dryrun: 2 processes x 4 virtual CPU devices (VERDICT r3 #8).

Spawns two dist_dryrun_worker.py processes that train the tiny synthetic
scene through the production Trainer over one GLOBAL 8-device mesh —
jax.distributed.initialize + per-host array feeding + process-0-gated host
work — and asserts both report the identical replicated loss.

    PYTHONPATH=/root/repo python scripts/dist_dryrun.py
"""

import os
import re
import subprocess
import sys
import tempfile


def main() -> int:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(root, "scripts", "dist_dryrun_worker.py")
    out_dir = tempfile.mkdtemp(prefix="mms_dist_dryrun_")
    procs = []
    for pid in range(2):
        env = dict(
            os.environ,
            MMS_COORDINATOR="127.0.0.1:9733",
            MMS_NUM_PROCESSES="2",
            MMS_PROCESS_ID=str(pid),
            MMS_DRYRUN_OUT=out_dir,
            JAX_PLATFORMS="cpu",
        )
        env.pop("MMS_JAXCACHE", None)
        procs.append(
            subprocess.Popen(
                [sys.executable, worker],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    losses = {}
    ok = True
    for pid, p in enumerate(procs):
        out, _ = p.communicate(timeout=900)
        with open(f"/tmp/dist_dryrun_p{pid}.log", "w") as f:
            f.write(out)
        if p.returncode != 0:
            print(f"--- proc {pid} FAILED (rc={p.returncode}):\n{out}")
            ok = False
            continue
        m = re.search(r"FINAL_LOSS (\S+)", out)
        losses[pid] = float(m.group(1)) if m else None
        print(f"proc {pid}: loss={losses[pid]}")
    if not ok:
        return 1
    if losses[0] is None or losses[0] != losses[1]:
        print(f"loss mismatch across processes: {losses}")
        return 1
    print("multi-host dryrun OK: identical replicated loss on both processes")
    return 0


if __name__ == "__main__":
    sys.exit(main())
