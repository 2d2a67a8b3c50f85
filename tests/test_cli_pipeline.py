"""End-to-end CLI pipeline: sparse-train -> prune -> --prune_quant QAT ->
--prune_qaft QAFT -> bn-fuse -> freeze-int (VERDICT r1 item 7).

Mirrors the reference's documented compression workflow
(README: pruning/main.py -sr -> normal_regular_prune.py ->
iao/main.py --prune_quant -> --prune_qaft --qaft -> bn_fuse.py ->
deploy), driven through ``micronet_tpu.cli.main`` exactly as a user
would. Every stage consumes the previous stage's checkpoint; the pruned
channel widths ride the {cfg, state} checkpoint headers so no stage
needs --cfg re-typed.
"""

import pytest

import numpy as np
from flax import nnx

from micronet_tpu import cli
from micronet_tpu.models import nin
from micronet_tpu.nn import eval_mode, prepare
from micronet_tpu.quant.config import QuantConfig
from micronet_tpu.train import checkpoint


@pytest.mark.slow
def test_cli_prune_quant_qaft_fuse_engine(tmp_path):
    common = ["--model_type", "0", "--epochs", "1", "--train_batch_size", "128"]
    float_ckpt = str(tmp_path / "float.npz")
    pruned_ckpt = str(tmp_path / "pruned.npz")
    quant_ckpt = str(tmp_path / "quant.npz")
    qaft_ckpt = str(tmp_path / "qaft.npz")
    fused_ckpt = str(tmp_path / "fused.npz")
    engine_ckpt = str(tmp_path / "engine.npz")
    cfg8 = ",".join(["8"] * 8)

    # 1) sparsity training (pruning/main.py -sr)
    rc = cli.main(
        ["train", "--method", "float", "-sr", "--s", "1e-3", "--cfg", cfg8,
         "--save", float_ckpt] + common
    )
    assert rc == 0

    # 2) channel pruning -> {cfg, state} checkpoint
    rc = cli.main(
        ["prune", "--model_type", "0", "--cfg", cfg8, "--model", float_ckpt,
         "--percent", "0.3", "--normal_regular", "2", "--save", pruned_ckpt]
    )
    assert rc == 0
    pruned_cfg = cli._ckpt_cfg(pruned_ckpt)
    assert pruned_cfg is not None and any(c != 8 for c in pruned_cfg)

    # 3) QAT on the pruned architecture (--prune_quant), cfg from header
    rc = cli.main(
        ["train", "--method", "iao", "--bn_fuse", "--prune_quant", pruned_ckpt,
         "--save", quant_ckpt] + common
    )
    assert rc == 0
    assert cli._ckpt_cfg(quant_ckpt) == pruned_cfg  # cfg rides the quant ckpt

    # 4) QAFT finetune of the pruned QUANT checkpoint (--prune_qaft --qaft)
    rc = cli.main(
        ["train", "--method", "iao", "--bn_fuse", "--qaft",
         "--prune_qaft", quant_ckpt, "--lr", "1e-5", "--save", qaft_ckpt]
        + common
    )
    assert rc == 0

    # 5) export: BN fusion (+ dumps), cfg picked up from the checkpoint
    rc = cli.main(
        ["bn-fuse", "--method", "iao", "--model_type", "0", "--bn_fuse",
         "--qaft", "--model", qaft_ckpt, "--save", fused_ckpt, "--dump"]
    )
    assert rc == 0
    assert (tmp_path / "fused.txt").exists()
    assert (tmp_path / "fused_para.json").exists()

    # 6) deploy: int8 engine
    rc = cli.main(
        ["freeze-int", "--model_type", "0", "--bn_fuse", "--qaft",
         "--model", qaft_ckpt, "--save", engine_ckpt]
    )
    assert rc == 0

    # 7) oracle: the QAFT train model and the exported engine agree on
    # predictions (the reference's accuracy-equivalence contract)
    qcfg = QuantConfig(a_bits=8, w_bits=8, bn_fuse=True, qaft=True)
    q = prepare(nin.Net(cfg=pruned_cfg, rngs=nnx.Rngs(0)), qcfg, method="iao")
    checkpoint.load_state(qaft_ckpt, q)
    eval_mode(q)

    from micronet_tpu.infer import freeze_int, fuse_bn_iao

    fused = fuse_bn_iao(q, qcfg)
    eval_mode(fused)
    import jax

    x = jax.random.normal(jax.random.PRNGKey(3), (8, 32, 32, 3))
    engine = freeze_int(fused, example_input=x[:1])
    eval_mode(engine)
    y_train = np.asarray(q(x))
    y_int = np.asarray(engine(x))
    assert np.array_equal(np.argmax(y_train, -1), np.argmax(y_int, -1))


@pytest.mark.slow
def test_cli_kl_ptq_then_deploy(tmp_path):
    """float train -> KL-entropy PTQ (--ptq_observer kl --calib_cache) ->
    deploy (serialized StableHLO artifact) — the reference's TRT leg
    (calibrate with IInt8EntropyCalibrator2 + cache, build + serialize the
    engine, eval_trt.py:145-172) as one CLI chain."""
    import os

    import jax

    common = ["--model_type", "0", "--epochs", "1", "--train_batch_size", "64"]
    cfg8 = ",".join(["8"] * 8)
    float_ckpt = str(tmp_path / "float.npz")
    ptq_ckpt = str(tmp_path / "ptq.npz")
    cache = str(tmp_path / "calib.json")
    artifact = str(tmp_path / "engine.stablehlo")

    rc = cli.main(
        ["train", "--method", "float", "--cfg", cfg8, "--save", float_ckpt]
        + common
    )
    assert rc == 0

    rc = cli.main(
        ["train", "--method", "iao", "--cfg", cfg8, "--refine", float_ckpt,
         "--bn_fuse", "--pretrained_model", "--ptq", "--ptq_observer", "kl",
         "--ptq_batch", "3", "--calib_cache", cache, "--save", ptq_ckpt]
        + common
    )
    assert rc == 0
    assert os.path.exists(cache)
    assert os.path.exists(ptq_ckpt)

    rc = cli.main(
        ["deploy", "--model_type", "0", "--cfg", cfg8, "--model", ptq_ckpt,
         "--bn_fuse", "--ptq", "--ptq_observer", "kl", "--batch", "4",
         "--save", artifact]
    )
    assert rc == 0

    from micronet_tpu.infer import deserialize_engine

    runner = deserialize_engine(artifact)
    y = np.asarray(runner(jax.numpy.zeros((4, 32, 32, 3), "float32")))
    assert y.shape == (4, 10) and np.isfinite(y).all()


def test_cli_two_stage_wbwtab(tmp_path, capsys):
    """--two_stage N: stage 1 trains with float activations, then the
    activations binarize and the main schedule runs — the round-5
    recipe surfaced as a CLI flag (wbwtab/main.py analog)."""
    from micronet_tpu.nn import qat_wbwtab
    from micronet_tpu.train import load_state

    ckpt = str(tmp_path / "bin2s.npz")
    rc = cli.main(
        ["train", "--method", "wbwtab", "--W", "2", "--A", "2",
         "--two_stage", "1", "--model_type", "0", "--cfg", ",".join(["8"] * 8),
         "--epochs", "1", "--train_batch_size", "128", "--save", ckpt]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "two-stage: stage-1 (float A)" in out
    # the saved checkpoint restores into a BINARY-activation net
    model = nin.Net(cfg=[8] * 8, rngs=nnx.Rngs(0))
    q = prepare(model, QuantConfig(W=2, A=2), method="wbwtab", inplace=True)
    load_state(ckpt, q)
    acts = [m for _, m in nnx.iter_modules(q)
            if isinstance(m, qat_wbwtab.ActivationQuantizer)]
    assert acts and all(m.A == 2 for m in acts)
