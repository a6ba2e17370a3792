"""Worker for the 2-process ``jax.distributed`` loopback test
(tests/test_multihost.py::test_two_process_loopback). Runs as a separate
interpreter per process: argv = coordinator host:port, num_processes,
process_id. Prints ``MULTIHOST_OK <pid> <psum>`` on success."""

import os
import sys


def main():
    coord, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    # 2 virtual CPU devices per process -> 4 global devices over DCN.
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cusmc_tpu.parallel.multihost import (
        global_mesh,
        initialize_distributed,
        process_info,
    )

    initialize_distributed(coordinator_address=coord, num_processes=nproc,
                           process_id=pid)
    # Idempotency: a second call must be a silent no-op.
    initialize_distributed(coordinator_address=coord, num_processes=nproc,
                           process_id=pid)

    info = process_info()
    assert info["process_count"] == nproc, info
    assert info["global_devices"] == 2 * nproc, info
    assert info["local_devices"] == 2, info

    try:
        shard_map = jax.shard_map
    except AttributeError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map

    mesh = global_mesh({"particles": 2 * nproc})
    sharding = NamedSharding(mesh, P("particles"))
    data = np.arange(2 * nproc, dtype=np.float32)
    garr = jax.make_array_from_callback((2 * nproc,), sharding,
                                        lambda idx: data[idx])

    @jax.jit
    def total(x):
        return shard_map(lambda v: jax.lax.psum(jnp_sum(v), "particles"),
                         mesh=mesh, in_specs=P("particles"),
                         out_specs=P())(x)

    import jax.numpy as jnp

    def jnp_sum(v):
        return jnp.sum(v)

    s = total(garr)
    val = float(np.asarray(s.addressable_data(0)))
    expect = float(data.sum())
    assert val == expect, (val, expect)
    print(f"MULTIHOST_OK {pid} {val}", flush=True)


if __name__ == "__main__":
    main()
