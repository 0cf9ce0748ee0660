"""2-process `jax.distributed` CPU test for parallel/distributed.py.

Spawns two fresh python processes (the pytest process already has a JAX
backend initialised, so the distributed runtime must come up in children),
each owning one virtual CPU device, and asserts initialize() + global_mesh()
+ a cross-process psum round-trip.
"""

import os
import subprocess
import sys
import textwrap

import pytest

_CHILD = textwrap.dedent("""
    import os, sys
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    pid = int(sys.argv[1]); port = sys.argv[2]
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P
    from pinn_for_quantum_wavefunction_surfaces_tpu.parallel import distributed

    distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert distributed.is_coordinator() == (pid == 0)
    mesh = distributed.global_mesh()
    assert mesh.devices.size == 2

    # cross-process psum: each process contributes its (process_id + 1);
    # every process must see the global sum 3
    from jax import shard_map
    local = jnp.full((1,), float(pid + 1))
    garr = jax.make_array_from_single_device_arrays(
        (2,), NamedSharding(mesh, P("data")),
        [jax.device_put(local, mesh.local_devices[0])])

    def f(x):
        return jax.lax.psum(x.sum(), "data")

    out = jax.jit(shard_map(f, mesh=mesh, in_specs=P("data"),
                            out_specs=P()))(garr)
    # out is fully replicated: every process holds the global sum locally
    total = float(np.asarray(out.addressable_shards[0].data))
    assert total == 3.0, total
    print(f"proc {pid} OK total={total}", flush=True)
""")


@pytest.mark.skipif(os.environ.get("SKIP_DISTRIBUTED_TEST") == "1",
                    reason="explicitly disabled")
def test_two_process_psum(tmp_path):
    import socket
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    script = tmp_path / "child.py"
    script.write_text(_CHILD)
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("JAX_", "XLA_"))}
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(pid), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True)
        for pid in (0, 1)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"proc {pid} OK total=3.0" in out
