"""Multi-HOST validation of the production sharded driver.

The user guide's multi-host claim ("the same SPMD program runs under
``jax.distributed.initialize()`` across hosts") is exercised for real here:
two OS processes, each owning 4 virtual CPU devices, initialize a gloo
distributed runtime and run the FULL collapse driver (``solve_collapse``
with ``n_devices = 8``) on the flagship plastic GNL case.  Process 0's
load-displacement history must match a single-process 8-device run of the
identical case (cross-host psum reduction order may differ, so the
tolerance is roundoff-scale rather than exact).

This covers SURVEY.md section 5's "distributed communication backend" row
end-to-end: device mesh spanning processes, one cross-host psum per
operator application, replicated history scalars fetched on every host,
and the element-sharded Gauss state gathered via ``process_allgather``.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys
sys.path.insert(0, os.getcwd())
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=nproc,
    process_id=pid,
    cluster_detection_method="deactivate",
)
import __graft_entry__ as g
import fcvm_tpu
from fcvm_tpu.config import get_config
from fcvm_tpu.models.inp import ControlParams

_, model = g._flagship(n=2)
cfg = get_config()
cfg.n_devices = jax.device_count()
assert jax.process_count() == nproc
params = ControlParams(
    sig_yield=60.0, nstep=3, error_max=1e-9, et_e=0.1,
    target_lf=99.0, gnl="GNLY", max_imp=0.0,
)
res = fcvm_tpu.solve_collapse(model, params)
out = {
    "lbd": [float(v) for v in res.history.lbd],
    "un": [float(v) for v in res.history.un],
    "peeq_max": float(res.peeq_gp.max()),
    "svm_sum": float(np.sum(res.svm_gp)),
}
if pid == 0:
    with open(sys.argv[4], "w") as f:
        json.dump(out, f)
print(f"proc {pid} done lbd={out['lbd'][-1]:.12f}", flush=True)
"""


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_reference_singleprocess():
    import __graft_entry__ as g
    import fcvm_tpu
    from fcvm_tpu.config import get_config
    from fcvm_tpu.models.inp import ControlParams

    _, model = g._flagship(n=2)
    cfg = get_config()
    prev = cfg.n_devices
    cfg.n_devices = 8
    try:
        params = ControlParams(
            sig_yield=60.0, nstep=3, error_max=1e-9, et_e=0.1,
            target_lf=99.0, gnl="GNLY", max_imp=0.0,
        )
        res = fcvm_tpu.solve_collapse(model, params)
    finally:
        cfg.n_devices = prev
    return {
        "lbd": [float(v) for v in res.history.lbd],
        "un": [float(v) for v in res.history.un],
        "peeq_max": float(res.peeq_gp.max()),
        "svm_sum": float(np.sum(res.svm_gp)),
    }


CLI_CASE = """
name = "mh_cli"
[mesh.generator]
kind = "box"
nx = 2
lx = 10.0

[material]
e = 210000.0
nu = 0.3

[control]
sig_yield = 60.0
nstep = 2
error_max = 1e-8
et_e = 0.1
target_lf = 99.0

[[bc]]
where = "x < 1e-9"
ux = 0.0
uy = 0.0
uz = 0.0

[[load.face]]
where = "x > 10.0 - 1e-9"
traction = [50.0, 0.0, 0.0]
"""


def test_cli_distributed_two_processes(tmp_path):
    """`python -m fcvm_tpu run --distributed` across two OS processes.

    The user-facing multi-host launch: the same CLI command on every host,
    rank resolved from --process-id.  Process 0 writes the output bundle,
    other ranks stay silent and write nothing.
    """
    case = tmp_path / "case.toml"
    case.write_text(CLI_CASE)
    outdirs = [tmp_path / "out0", tmp_path / "out1"]
    port = _free_port()
    nproc, n_local = 2, 2
    procs = []
    for pid in range(nproc):
        env = dict(os.environ)
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "")
            .replace("--xla_force_host_platform_device_count=8", "")
            + f" --xla_force_host_platform_device_count={n_local}"
        ).strip()
        env.pop("PYTHONPATH", None)
        procs.append(
            subprocess.Popen(
                [
                    sys.executable, "-m", "fcvm_tpu", "run", str(case),
                    "--outdir", str(outdirs[pid]), "--cpu", "--x64",
                    "--distributed",
                    "--coordinator", f"127.0.0.1:{port}",
                    "--num-processes", str(nproc),
                    "--process-id", str(pid),
                ],
                env=env,
                cwd=REPO,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-6000:]}"
    assert "final load level" in outs[0]
    assert (outdirs[0] / "mh_cli.out").exists()
    # rank 1 narrates nothing and writes nothing
    assert "final load level" not in outs[1]
    assert not (outdirs[1] / "mh_cli.out").exists()


def test_two_process_gloo_matches_single_process(tmp_path):
    port = _free_port()
    outfile = str(tmp_path / "hist0.json")
    nproc, n_local = 2, 4
    procs = []
    for pid in range(nproc):
        env = dict(os.environ)
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "")
            .replace("--xla_force_host_platform_device_count=8", "")
            + f" --xla_force_host_platform_device_count={n_local}"
        ).strip()
        env["JAX_PLATFORMS"] = "cpu"
        env.pop("PYTHONPATH", None)
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", CHILD, str(pid), str(nproc), str(port), outfile],
                env=env,
                cwd=REPO,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=840)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-6000:]}"

    with open(outfile) as f:
        multi = json.load(f)
    ref = _run_reference_singleprocess()

    assert len(multi["lbd"]) == len(ref["lbd"])
    np.testing.assert_allclose(multi["lbd"], ref["lbd"], rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(multi["un"], ref["un"], rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(multi["peeq_max"], ref["peeq_max"], rtol=1e-8)
    np.testing.assert_allclose(multi["svm_sum"], ref["svm_sum"], rtol=1e-8)
    assert multi["peeq_max"] > 0.0  # actually exercised plasticity
