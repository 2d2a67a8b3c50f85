"""Round-5 recipe ladder for the three accuracy gaps (VERDICT r4 items 2-3).

Targets, all vs the 20-epoch fp32 nin_gc baseline on the synthetic set
(ACC_TABLE.json rows.fp32.acc = 0.9243):

  - W4A4 best recipe:     delta <= 0.5%   (round 4 best: -1.04%)
  - wbwtab binW + binA:   delta <= 8%     (round 4: 14.5%)
  - wbwtab terW + binA:   delta <= 6%     (round 4: 8.6%)
  - gc_prune_quant:       delta <= 8%     (round 4: 17.1%)

Levers (the reference's own knobs + standard QAT practice, no new
semantics): longer milestone-scheduled budgets (the reference trains
~300 epochs, README.md:1078), float warm starts (--refine,
iao/main.py:402-430), a QAFT tail at frozen stats (README.md:375-379),
and TWO-STAGE binarization for binary activations (train weights at
A=fp32 first, then binarize A and finetune — the weight landscape is
already in the binary-friendly basin; standard BNN practice).

Each experiment appends its row to RECIPE_SWEEP.json as it lands
(mid-run tunnel failures keep earlier results).

Run:  python benchmarks/recipe_sweep.py --exps w4a4_e40,binA_2stage ...
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import acc_table  # noqa: E402  (shares jax cache config + helpers)
import jax  # noqa: E402
from flax import nnx  # noqa: E402

OUT = os.path.join(ROOT, "RECIPE_SWEEP.json")


def _load_out():
    if os.path.exists(OUT):
        with open(OUT) as f:
            return json.load(f)
    return {"meta": {}, "rows": {}}


def _record(key, row):
    out = _load_out()
    out["rows"][key] = row
    out["meta"]["device"] = str(jax.devices()[0])
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(f"[sweep] {key}: {json.dumps(row)}", flush=True)


def _data(args):
    os.environ["MICRONET_SYNTHETIC_NOISE"] = str(args.noise)
    os.environ.setdefault("MICRONET_SYNTHETIC_SIZE", str(args.train_size))
    from micronet_tpu.train import data as data_lib

    return data_lib.load_cifar10(synthetic_size=args.train_size)


def _build():
    from micronet_tpu.models import nin_gc

    return lambda rngs: nin_gc.Net(rngs=rngs)


def _w4a4_cfg():
    from micronet_tpu.quant.config import QuantConfig

    # the round-4 best recipe: asymmetric ranges + first/last at 8 bits
    return QuantConfig(
        a_bits=4, w_bits=4, bn_fuse=True, q_type=1,
        first_layer_a_bits=8, first_layer_w_bits=8,
        last_layer_a_bits=8, last_layer_w_bits=8,
    )


def _fp32_model(data, epochs):
    best, model, trainer = acc_table._train_one(
        _build(), None, None, data, epochs
    )
    return best, model


def _train_qat_from(model_fp32, qcfg, data, epochs, lr=1e-3):
    """Warm-start QAT: load the float weights into a fresh net, prepare
    with pretrained_model=True (first-batch BN stat seeding), train."""
    from micronet_tpu.models import nin_gc
    from micronet_tpu.nn import prepare
    from micronet_tpu.train import load_state, save_state

    cfg = dataclasses.replace(qcfg, pretrained_model=True)
    with tempfile.TemporaryDirectory() as td:
        ck = os.path.join(td, "fp32.npz")
        save_state(ck, model_fp32)
        fresh = nin_gc.Net(rngs=nnx.Rngs(1))
        load_state(ck, fresh)
    q = prepare(fresh, cfg, method="iao", inplace=True)
    best, model, trainer = acc_table._train_one(
        None, None, None, data, epochs, lr=lr, model=q
    )
    return best, model, trainer, cfg


def _qaft_tail(model, qcfg, data, epochs, lr=1e-5):
    """Finetune at frozen observers/qparams/BN (the reference's QAFT)."""
    from micronet_tpu.models import nin_gc
    from micronet_tpu.nn import prepare
    from micronet_tpu.train import load_state, save_state

    qaft_cfg = dataclasses.replace(qcfg, qaft=True, pretrained_model=True)
    with tempfile.TemporaryDirectory() as td:
        ck = os.path.join(td, "qat.npz")
        save_state(ck, model)
        fresh = prepare(
            _build()(nnx.Rngs(1)), qaft_cfg, method="iao", inplace=True
        )
        load_state(ck, fresh)
    best, m2, trainer = acc_table._train_one(
        None, None, None, data, epochs, lr=lr, model=fresh
    )
    return best, m2, trainer, qaft_cfg


def _wbwtab_two_stage(data, W, stage1_epochs, stage2_epochs, lr2=1e-3):
    """Stage 1: W-quantized, float activations. Stage 2: flip every
    ActivationQuantizer to binary and finetune (milestone schedule)."""
    from micronet_tpu.nn import qat_wbwtab
    from micronet_tpu.quant.config import QuantConfig

    cfg1 = QuantConfig(W=W, A=32)
    best1, model, trainer = acc_table._train_one(
        _build(), "wbwtab", cfg1, data, stage1_epochs
    )
    for _, m in nnx.iter_modules(model):
        if isinstance(m, qat_wbwtab.ActivationQuantizer):
            m.A = 2
    cfg2 = QuantConfig(W=W, A=2)
    best2, model, trainer = acc_table._train_one(
        None, None, None, data, stage2_epochs, lr=lr2, model=model
    )
    return best1, best2, model, trainer, cfg2


# ---------------------------------------------------------------- experiments


def exp_w4a4_e40(data, args):
    best, model, trainer = acc_table._train_one(
        _build(), "iao", _w4a4_cfg(), data, 40
    )
    e, f = acc_table._engine_acc_iao(model, _w4a4_cfg(), trainer)
    return {"acc": best, "engine_acc": e, "epochs": 40}


def exp_w4a4_warm(data, args):
    fp_best, fp_model = _fp32_model(data, args.epochs)
    best, model, trainer, cfg = _train_qat_from(
        fp_model, _w4a4_cfg(), data, args.epochs
    )
    e, f = acc_table._engine_acc_iao(model, cfg, trainer)
    return {"acc": best, "engine_acc": e, "fp32_start": fp_best,
            "epochs": args.epochs}


def exp_w4a4_warm_e40(data, args):
    fp_best, fp_model = _fp32_model(data, args.epochs)
    best, model, trainer, cfg = _train_qat_from(
        fp_model, _w4a4_cfg(), data, 40
    )
    e, f = acc_table._engine_acc_iao(model, cfg, trainer)
    return {"acc": best, "engine_acc": e, "fp32_start": fp_best,
            "epochs": 40}


def exp_w4a4_qafttail(data, args):
    best, model, trainer = acc_table._train_one(
        _build(), "iao", _w4a4_cfg(), data, args.epochs
    )
    best2, m2, tr2, qaft_cfg = _qaft_tail(model, _w4a4_cfg(), data, 8)
    e, f = acc_table._engine_acc_iao(m2, qaft_cfg, tr2)
    return {"acc": best2, "qat_acc": best, "engine_acc": e,
            "epochs": args.epochs + 8}


def exp_w4a4_warm_qafttail(data, args):
    fp_best, fp_model = _fp32_model(data, args.epochs)
    best, model, trainer, cfg = _train_qat_from(
        fp_model, _w4a4_cfg(), data, 40
    )
    best2, m2, tr2, qaft_cfg = _qaft_tail(model, cfg, data, 8)
    e, f = acc_table._engine_acc_iao(m2, qaft_cfg, tr2)
    return {"acc": best2, "qat_acc": best, "engine_acc": e,
            "fp32_start": fp_best, "epochs": 48}


def exp_binA_long(data, args):
    from micronet_tpu.quant.config import QuantConfig

    cfg = QuantConfig(W=2, A=2)
    best, model, trainer = acc_table._train_one(
        _build(), "wbwtab", cfg, data, args.long_epochs
    )
    e, f = acc_table._engine_acc_wbwtab(model, cfg, trainer)
    return {"acc": best, "engine_acc": e, "epochs": args.long_epochs}


def exp_terA_long(data, args):
    from micronet_tpu.quant.config import QuantConfig

    cfg = QuantConfig(W=3, A=2)
    best, model, trainer = acc_table._train_one(
        _build(), "wbwtab", cfg, data, args.long_epochs
    )
    e, f = acc_table._engine_acc_wbwtab(model, cfg, trainer)
    return {"acc": best, "engine_acc": e, "epochs": args.long_epochs}


def exp_binA_2stage(data, args):
    b1, b2, model, trainer, cfg = _wbwtab_two_stage(
        data, W=2, stage1_epochs=40, stage2_epochs=80
    )
    e, f = acc_table._engine_acc_wbwtab(model, cfg, trainer)
    return {"acc": b2, "stage1_acc": b1, "engine_acc": e, "epochs": 120}


def exp_terA_2stage(data, args):
    b1, b2, model, trainer, cfg = _wbwtab_two_stage(
        data, W=3, stage1_epochs=40, stage2_epochs=80
    )
    e, f = acc_table._engine_acc_wbwtab(model, cfg, trainer)
    return {"acc": b2, "stage1_acc": b1, "engine_acc": e, "epochs": 120}


def exp_gc_2stage_long(data, args):
    """Group+Prune+Quant composite at an extended two-stage budget
    (stage1 2x, stage2 8x the base epochs — approaching the reference's
    ~300-epoch regime for its flagship composite row)."""
    import tempfile

    from micronet_tpu import cli
    from micronet_tpu.models import nin_gc
    from micronet_tpu.nn import eval_mode, qat_wbwtab
    from micronet_tpu.prune import compute_prune_masks
    from micronet_tpu.quant.config import QuantConfig
    from micronet_tpu.train import load_state

    with tempfile.TemporaryDirectory() as td:
        sparse_ckpt = os.path.join(td, "sparse_gc.npz")
        cli.main(
            ["train", "--method", "float", "--model_type", "1", "-sr", "--s",
             "0.0001", "--epochs", str(args.epochs), "--save", sparse_ckpt]
        )
        sparse = nin_gc.Net(rngs=nnx.Rngs(0))
        load_state(sparse_ckpt, sparse)
        eval_mode(sparse)
        cfg_pruned, _, ratio = compute_prune_masks(sparse, 0.5, gc=True, layers=9)
    build = lambda rngs: nin_gc.Net(cfg=list(cfg_pruned), rngs=rngs)
    cfg1 = QuantConfig(W=3, A=32)
    b1, model, trainer = acc_table._train_one(
        build, "wbwtab", cfg1, data, 2 * args.epochs
    )
    for _, m in nnx.iter_modules(model):
        if isinstance(m, qat_wbwtab.ActivationQuantizer):
            m.A = 2
    cfg2 = QuantConfig(W=3, A=2)
    b2, model, trainer = acc_table._train_one(
        None, None, None, data, 8 * args.epochs, model=model
    )
    e, f = acc_table._engine_acc_wbwtab(model, cfg2, trainer)
    return {"acc": b2, "stage1_acc": b1, "engine_acc": e,
            "epochs": 10 * args.epochs,
            "pruned_cfg": [int(c) for c in cfg_pruned]}


EXPS = {
    "gc_2stage_long": exp_gc_2stage_long,
    "w4a4_e40": exp_w4a4_e40,
    "w4a4_warm": exp_w4a4_warm,
    "w4a4_warm_e40": exp_w4a4_warm_e40,
    "w4a4_qafttail": exp_w4a4_qafttail,
    "w4a4_warm_qafttail": exp_w4a4_warm_qafttail,
    "binA_long": exp_binA_long,
    "terA_long": exp_terA_long,
    "binA_2stage": exp_binA_2stage,
    "terA_2stage": exp_terA_2stage,
}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--exps", required=True,
                    help="comma-separated experiment names, or 'all'")
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--long_epochs", type=int, default=160)
    ap.add_argument("--train_size", type=int, default=8192)
    ap.add_argument("--noise", type=float, default=8.5)
    args = ap.parse_args(argv)
    names = list(EXPS) if args.exps == "all" else args.exps.split(",")
    data = _data(args)
    for name in names:
        t0 = time.time()
        try:
            row = EXPS[name](data, args)
        except Exception as e:  # keep later experiments alive
            row = {"error": repr(e)[:300]}
        row = {
            k: (round(v, 4) if isinstance(v, float) else v)
            for k, v in row.items()
        }
        row["seconds"] = round(time.time() - t0, 1)
        _record(name, row)


if __name__ == "__main__":
    main()
