"""Two-PROCESS jax.distributed smoke test on CPU.

Everything else in the suite simulates multi-device SPMD inside one process
(8 virtual CPU devices); this test validates the actual multi-host entry
points — ``initialize_distributed`` + ``allgather_ragged`` — across two real
processes joined through a coordinator, the way a pod-slice run would be
launched (reference counterpart: torch.distributed.launch +
accelerator.gather_for_metrics).
"""

import json
import os
import socket
import subprocess
import sys

CHILD = r"""
import json, os, sys
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
from spokennlp_tpu.parallel import dist

pid = int(sys.argv[1])
ok = dist.initialize_distributed(
    coordinator_address=sys.argv[2], num_processes=2, process_id=pid
)
assert ok, "initialize_distributed returned False"
assert jax.process_count() == 2, jax.process_count()
local = [[pid * 10 + 1, pid * 10 + 2], [pid * 100 + 7]]
out = dist.allgather_ragged(local)
print("RESULT" + str(pid), json.dumps(out), flush=True)
"""


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_allgather():
    addr = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # keep the axon backend out
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", CHILD, str(i), addr],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
    want = [[1, 2], [7], [11, 12], [107]]  # process order, ragged preserved
    for i, out in enumerate(outs):
        line = [l for l in out.splitlines() if l.startswith(f"RESULT{i}")][0]
        got = json.loads(line.split(" ", 1)[1])
        assert got == want, (i, got)
