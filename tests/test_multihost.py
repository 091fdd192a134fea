"""Multi-host sharding utilities, exercised with REAL multiple JAX
processes (jax.distributed over localhost, CPU platform, 4 virtual
devices per process -> 8 global).

Covers the multi-host gap make_mesh()'s guard documents: global-mesh
construction, per-process batch assembly (shard_batch_global), replicated
params (replicate_global), and a data-parallel psum step across hosts —
the sharded-training topology SURVEY §2.7's reference never had.
"""
import os
import socket
import subprocess
import sys
import textwrap


ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent("""
    import os, sys
    sys.path.insert(0, %(root)r)
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=%(addr)r,
                               num_processes=2,
                               process_id=int(sys.argv[1]))
    import jax.numpy as jnp
    import numpy as np
    from pvnet_tpu.parallel import (make_global_mesh, make_mesh,
                                    replicate_global, shard_batch_global)

    pid = jax.process_index()
    assert jax.process_count() == 2
    assert len(jax.devices()) == 8, jax.devices()
    assert len(jax.local_devices()) == 4

    # the single-process helper must refuse to run here
    try:
        make_mesh()
        raise AssertionError("make_mesh() should raise under multi-host")
    except NotImplementedError:
        pass

    mesh = make_global_mesh()
    # each process contributes 4 distinct rows of the global batch of 8
    local = np.arange(4 * 3, dtype=np.float32).reshape(4, 3) + 100 * pid
    batch = shard_batch_global({"x": local}, mesh)
    assert batch["x"].shape == (8, 3), batch["x"].shape

    params = replicate_global({"w": np.full((3,), 2.0, np.float32)}, mesh)

    from jax.sharding import NamedSharding, PartitionSpec as P

    @jax.jit
    def step(p, b):
        y = (b["x"] * p["w"]).sum(axis=1)       # [8] data-sharded
        return y, jnp.sum(y)                    # global reduction

    y, total = step(params, batch)
    # expected: rows 0-3 from proc 0, rows 4-7 from proc 1
    g = np.concatenate([np.arange(12, dtype=np.float32).reshape(4, 3)
                        + 100 * p for p in (0, 1)])
    want = (g * 2.0).sum(axis=1)
    for shard in y.addressable_shards:
        rows = shard.index[0]
        np.testing.assert_allclose(np.asarray(shard.data).reshape(-1),
                                   want[rows], rtol=1e-6)
        assert (rows.start // 4 == pid), (rows, pid)  # my rows on my host
    # the jitted global reduction sees every host's data
    np.testing.assert_allclose(float(total), want.sum(), rtol=1e-6)
    print(f"proc {pid} OK", flush=True)
""")


def test_two_process_global_mesh(tmp_path):
    port = socket.socket()
    port.bind(("127.0.0.1", 0))
    addr = f"127.0.0.1:{port.getsockname()[1]}"
    port.close()

    script = tmp_path / "worker.py"
    script.write_text(WORKER % {"root": ROOT, "addr": addr})
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_PLATFORMS", None)

    procs = [subprocess.Popen([sys.executable, str(script), str(i)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, env=env, text=True)
             for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"proc {i} OK" in out
