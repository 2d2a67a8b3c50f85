"""Worker process for the 2-process DCN-path test (test_multiprocess.py).

Run as: python _mp_worker.py <process_id> <num_processes> <port> <tmpdir>

Each process owns 4 virtual CPU devices; ``jax.distributed.initialize``
joins them into one 8-device cluster — the same bring-up a real
multi-host TPU pod uses over DCN (parallel/distributed.py::initialize).
The worker drives one data-parallel QAT step on a global batch whose
halves live on different processes, then asserts the quantizer/BN state
is bitwise identical across processes (the observer-sync contract the
reference's DataParallel never had — SURVEY.md §2.9), and round-trips a
checkpoint written by process 0.
"""

import os
import sys


def main() -> None:
    pid, nprocs = int(sys.argv[1]), int(sys.argv[2])
    port, tmpdir = sys.argv[3], sys.argv[4]

    # jax is preloaded at interpreter start in this environment (axon
    # sitecustomize), so re-point the backend in process, conftest-style.
    import jax

    jax.config.update("jax_num_cpu_devices", 4)
    jax.config.update("jax_platforms", "cpu")

    from micronet_tpu.parallel import initialize

    initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nprocs,
        process_id=pid,
    )
    assert jax.process_count() == nprocs, jax.process_count()
    assert jax.device_count() == 4 * nprocs, jax.device_count()

    import numpy as np
    import optax
    from flax import nnx
    from jax.experimental import multihost_utils
    from jax.sharding import NamedSharding, PartitionSpec as P

    from micronet_tpu.models.lenet import LeNet
    from micronet_tpu.nn import prepare, train_mode
    from micronet_tpu.parallel import make_mesh, shard_model_and_optimizer
    from micronet_tpu.quant.config import QuantConfig
    from micronet_tpu.train.checkpoint import load_state, save_state, state_to_arrays

    # identical init on every process (same seed)
    q = prepare(
        LeNet(rngs=nnx.Rngs(0)),
        QuantConfig(a_bits=8, w_bits=8),
        method="iao",
    )
    train_mode(q)
    opt = nnx.Optimizer(q, optax.adam(1e-3), wrt=nnx.Param)
    mesh = make_mesh(data=jax.device_count())
    shard_model_and_optimizer(q, opt, mesh)
    gdef, state = nnx.split((q, opt))

    # global batch 16: each process contributes ITS OWN half (different
    # data per process — the point of the test)
    gbatch = 16
    rng = np.random.RandomState(1234)
    X = rng.randn(gbatch, 32, 32, 3).astype(np.float32)
    Y = rng.randint(0, 10, size=(gbatch,)).astype(np.int32)
    lo, hi = pid * (gbatch // nprocs), (pid + 1) * (gbatch // nprocs)
    x = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), X[lo:hi]
    )
    y = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), Y[lo:hi]
    )

    @jax.jit
    def step(state, x, y):
        m, o = nnx.merge(gdef, state)

        def loss_fn(m):
            return optax.softmax_cross_entropy_with_integer_labels(m(x), y).mean()

        loss, grads = nnx.value_and_grad(loss_fn)(m)
        o.update(m, grads)
        _, st = nnx.split((m, o))
        return st, loss

    for i in range(2):
        state, loss = step(state, x, y)
    loss = float(loss)
    assert np.isfinite(loss), loss

    model, opt = nnx.merge(gdef, state)

    # quant/BN state must be bitwise identical on every process: gather a
    # fingerprint of every non-Param leaf and compare across processes
    arrays = state_to_arrays(model)
    quant_vec = np.concatenate(
        [np.asarray(v, np.float64).ravel() for k, v in sorted(arrays.items())]
    )
    gathered = multihost_utils.process_allgather(quant_vec)
    assert gathered.shape[0] == nprocs
    for p in range(1, nprocs):
        np.testing.assert_array_equal(gathered[0], gathered[p])

    # checkpoint: process 0 writes, everyone loads, state must round-trip
    ckpt = os.path.join(tmpdir, "mp_ckpt.npz")
    if pid == 0:
        save_state(ckpt, model, optimizer=opt, step=2, best_acc=0.5)
    multihost_utils.sync_global_devices("ckpt_written")
    fresh = prepare(
        LeNet(rngs=nnx.Rngs(1)),  # different init — load must overwrite
        QuantConfig(a_bits=8, w_bits=8),
        method="iao",
    )
    train_mode(fresh)
    step_n, best, _ = load_state(ckpt, fresh)
    assert (step_n, best) == (2, 0.5), (step_n, best)
    restored = state_to_arrays(fresh)
    for k, v in arrays.items():
        np.testing.assert_array_equal(np.asarray(v), restored[k], err_msg=k)

    # eval through the restored model on the sharded global batch
    from micronet_tpu.nn import eval_mode

    eval_mode(fresh)
    logits = nnx.jit(lambda m, xb: m(xb))(fresh, x)
    logits_local = np.concatenate(
        [np.asarray(s.data) for s in logits.addressable_shards]
    )
    assert np.isfinite(logits_local).all()

    multihost_utils.sync_global_devices("done")
    print(f"WORKER{pid} OK loss={loss:.6f}", flush=True)


if __name__ == "__main__":
    main()
