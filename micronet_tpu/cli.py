"""Command-line drivers — the reference's per-task ``main.py`` scripts
(SURVEY.md §2.6) unified as subcommands of ``python -m micronet_tpu.cli``.

Flag names mirror the reference argparse surfaces so users can carry
their invocations over:

=====================  ===========================================
reference script        subcommand
=====================  ===========================================
wqaq/iao/main.py        train --method iao [--bn_fuse --ptq ...]
wqaq/dorefa/main.py     train --method dorefa
wbwtab/main.py          train --method wbwtab [--W 2 --A 2]
pruning/main.py         train --method float [-sr --s ...]
normal_regular_prune    prune [--normal_regular N]
gc_prune                prune --gc
iao|wbwtab bn_fuse.py   bn-fuse --method {iao,wbwtab}
*_model_test.py         model-test
(TensorRT deploy)       freeze-int (int-sim engine checkpoint),
                        deploy (serialized StableHLO artifact),
                        train --ptq --ptq_observer kl --calib_cache f
                        (entropy calibration + cache)
=====================  ===========================================
"""

from __future__ import annotations

import argparse
import sys



def _build_model(model_type: int, cfg, rngs):
    from .models import nin, nin_gc, resnet18

    if model_type == 0:
        return nin.Net(cfg=cfg, rngs=rngs)
    if model_type == 1:
        return nin_gc.Net(cfg=cfg, rngs=rngs)
    return resnet18(rngs=rngs)


def _parse_cfg(s):
    return [int(v) for v in s.split(",")] if s else None


def _ckpt_cfg(path, default=None):
    """Channel widths stored in a {cfg, state} checkpoint header — lets the
    export/eval subcommands rebuild PRUNED architectures without the user
    re-typing --cfg (the reference keeps cfg inside the checkpoint dict,
    e.g. normal_regular_prune.py:190-200 / iao main.py:346-372)."""
    import json as _json

    import numpy as _np

    try:
        with _np.load(path) as z:
            header = _json.loads(bytes(z["__header__"]).decode())
        return header.get("extra", {}).get("cfg", default)
    except Exception:
        return default


def _model_cfg(args):
    cfg = _parse_cfg(args.cfg)
    if cfg is None and getattr(args, "model", ""):
        cfg = _ckpt_cfg(args.model)
    return cfg


def _quant_config(args):
    from .quant.config import QuantConfig

    return QuantConfig(
        a_bits=args.a_bits,
        w_bits=args.w_bits,
        q_type=args.q_type,
        q_level=args.q_level,
        weight_observer=args.weight_observer,
        bn_fuse=args.bn_fuse,
        bn_fuse_calib=args.bn_fuse_calib,
        pretrained_model=args.pretrained_model,
        qaft=args.qaft,
        ptq=args.ptq,
        percentile=args.percentile,
        ptq_observer=getattr(args, "ptq_observer", "percentile"),
        first_layer_a_bits=getattr(args, "first_layer_a_bits", 0),
        first_layer_w_bits=getattr(args, "first_layer_w_bits", 0),
        last_layer_a_bits=getattr(args, "last_layer_a_bits", 0),
        last_layer_w_bits=getattr(args, "last_layer_w_bits", 0),
        W=args.W,
        A=args.A,
    )


def _add_quant_flags(p: argparse.ArgumentParser):
    p.add_argument("--a_bits", type=int, default=8)
    p.add_argument("--w_bits", type=int, default=8)
    p.add_argument("--q_type", type=int, default=0, help="0 sym, 1 asym")
    p.add_argument("--q_level", type=int, default=0, help="0 per-ch, 1 per-layer")
    p.add_argument("--weight_observer", type=int, default=0, help="0 minmax, 1 ema")
    p.add_argument("--bn_fuse", action="store_true")
    p.add_argument("--bn_fuse_calib", action="store_true")
    p.add_argument("--pretrained_model", action="store_true")
    p.add_argument("--qaft", action="store_true")
    p.add_argument("--ptq", action="store_true")
    p.add_argument("--ptq_control", action="store_true", help="cap PTQ at 2 epochs")
    p.add_argument("--ptq_batch", type=int, default=200)
    p.add_argument("--percentile", type=float, default=0.9999)
    # first/last-layer bit exceptions (0 = body width): the reference's
    # skip-first (dorefa) / skip-first-and-last (wbwtab) rules as bit
    # overrides — the documented low-bit recipe (QuantConfig docstring)
    p.add_argument("--first_layer_a_bits", type=int, default=0)
    p.add_argument("--first_layer_w_bits", type=int, default=0)
    p.add_argument("--last_layer_a_bits", type=int, default=0)
    p.add_argument("--last_layer_w_bits", type=int, default=0)
    p.add_argument(
        "--ptq_observer",
        choices=["percentile", "kl"],
        default="percentile",
        help="PTQ calibrator: reference percentile histogram, or "
        "TensorRT-style KL entropy calibration",
    )
    p.add_argument(
        "--calib_cache",
        default=None,
        help="KL calibration-table file: loaded if present, written "
        "otherwise (TRT calibration cache)",
    )
    p.add_argument("--W", type=int, default=2, help="wbwtab: 2 bin, 3 ter, 32 fp")
    p.add_argument("--A", type=int, default=2, help="wbwtab: 2 bin, 32 fp")
    p.add_argument(
        "--two_stage", type=int, default=0, metavar="EPOCHS",
        help="wbwtab + A=2 only: train EPOCHS against FLOAT activations "
        "first, then binarize activations and run the main schedule — "
        "the round-5 recipe that puts binary-activation nets at/above "
        "fp32 accuracy (ACC_TABLE.json; benchmarks/acc_table.py)",
    )


def cmd_train(args) -> int:
    from flax import nnx

    from .nn import prepare, train_mode
    from .train import TrainConfig, Trainer, load_state

    rngs = nnx.Rngs(args.seed)
    model_cfg = _parse_cfg(args.cfg)

    from .train.checkpoint import load_state as _load

    if args.prune_quant:
        # pruned FLOAT checkpoint: rebuild the pruned architecture, load,
        # then quantize below (iao/main.py --prune_quant branch)
        model_cfg = _ckpt_cfg(args.prune_quant, model_cfg)
        model = _build_model(args.model_type, model_cfg, rngs)
        _load(args.prune_quant, model)
    elif args.prune_qaft:
        # pruned QUANT checkpoint for QAFT: rebuild the pruned arch; the
        # state (incl. quant scale/zp/observers) loads AFTER prepare()
        # (iao/main.py --prune_qaft branch: prune -> quant -> QAFT handoff)
        model_cfg = _ckpt_cfg(args.prune_qaft, model_cfg)
        model = _build_model(args.model_type, model_cfg, rngs)
    else:
        model = _build_model(args.model_type, model_cfg, rngs)
    if args.refine:
        # float-checkpoint warm start before quantization (--refine,
        # iao/main.py:402-430)
        _load(args.refine, model)

    cfg = _quant_config(args)
    if args.method == "float":
        qmodel = model
    else:
        qmodel = prepare(model, cfg, method=args.method, inplace=True)
    if args.prune_qaft:
        _load(args.prune_qaft, qmodel)
    train_mode(qmodel)

    import os as _os

    if args.auto_resume and not args.resume:
        # preemption-safe restarts: prefer the per-epoch .latest file
        # (newest step) over the best-acc file, so at most one epoch of
        # progress is lost. Resolved BEFORE the two-stage block below —
        # a restarted two-stage run must NOT repeat stage 1 only to have
        # the checkpoint restore overwrite it
        def _step_of(p):
            import json as _json

            import numpy as _np

            try:
                with _np.load(p) as z:
                    return _json.loads(bytes(z["__header__"]).decode())["step"]
            except Exception:
                return -1

        cands = [
            p
            for p in (args.save + ".latest.npz", args.save)
            if _os.path.exists(p)
        ]
        if cands:
            args.resume = max(cands, key=_step_of)

    if (
        args.method == "wbwtab"
        and args.A == 2
        and getattr(args, "two_stage", 0) > 0
        and not args.resume
    ):
        # stage 1 of the two-stage W-then-A recipe: same net, activations
        # temporarily float; the weight landscape settles in the
        # binarization-friendly basin before sign() activations arrive
        from .nn import qat_wbwtab
        from .train import scaled_milestones

        for _, m in nnx.iter_modules(qmodel):
            if isinstance(m, qat_wbwtab.ActivationQuantizer):
                m.A = 32
        stage_cfg = TrainConfig(
            lr=args.lr,
            weight_decay=args.wd,
            batch_size=args.train_batch_size,
            epochs=args.two_stage,
            seed=args.seed,
            milestones=scaled_milestones(args.two_stage),
            metrics_path=args.metrics or None,
            grad_accum=args.grad_accum,
        )
        s1 = Trainer(qmodel, stage_cfg).fit()
        print(f"two-stage: stage-1 (float A) best acc {s1 * 100:.2f}%")
        for _, m in nnx.iter_modules(qmodel):
            if isinstance(m, qat_wbwtab.ActivationQuantizer):
                m.A = 2

    tcfg = TrainConfig(
        lr=args.lr,
        weight_decay=args.wd,
        batch_size=args.train_batch_size,
        epochs=args.epochs,
        seed=args.seed,
        ptq=args.ptq,
        ptq_batch=args.ptq_batch,
        ptq_control=args.ptq_control,
        calib_cache=args.calib_cache,
        metrics_path=args.metrics or None,
        async_checkpoint=args.async_checkpoint,
        keep_latest=args.auto_resume,
        grad_accum=args.grad_accum,
    )
    trainer = Trainer(qmodel, tcfg)
    if args.resume:
        step, best, _ = load_state(args.resume, qmodel, optimizer=trainer.optimizer)
        trainer.epoch, trainer.best_acc = step + 1, best
        print(f"resumed from {args.resume} at epoch {step} (best {best:.4f})")
    if trainer.data.source == "synthetic":
        print(
            "WARNING: CIFAR-10 not found on disk; training on the synthetic "
            "stand-in (set CIFAR10_DIR)",
            file=sys.stderr,
        )
    # sparsity hook for slimming runs (pruning/main.py:65-69)
    if args.sr:
        from .prune import bn_l1_grad_update

        base_step = trainer._train_step

        @nnx.jit
        def sparse_step(model, optimizer, key, images_u8, labels):
            import optax

            from .train import data as data_lib

            x = data_lib.augment_batch(key, images_u8)

            def loss_fn(model):
                logits = model(x)
                return (
                    optax.softmax_cross_entropy_with_integer_labels(
                        logits, labels
                    ).mean(),
                    logits,
                )

            (loss, logits), grads = nnx.value_and_grad(loss_fn, has_aux=True)(model)
            grads = bn_l1_grad_update(model, grads, args.s)
            optimizer.update(model, grads)
            import jax.numpy as jnp

            return loss, jnp.mean(jnp.argmax(logits, -1) == labels)

        trainer._train_step = sparse_step
    best = trainer.fit(
        checkpoint_path=args.save,
        checkpoint_extra={"cfg": model_cfg} if model_cfg else None,
    )
    print(f"best acc: {best * 100:.2f}%")
    return 0


def cmd_prune(args) -> int:
    from flax import nnx

    from .models import nin, nin_gc
    from .nn import eval_mode
    from .prune import compute_prune_masks, prune_model
    from .train import load_state, save_state

    rngs = nnx.Rngs(0)
    ctor = nin.Net if args.model_type == 0 else nin_gc.Net
    model = ctor(cfg=_parse_cfg(args.cfg), rngs=rngs)
    if args.model:
        load_state(args.model, model)
    eval_mode(model)
    layers = 9
    cfg, masks, ratio = compute_prune_masks(
        model,
        args.percent,
        base_number=args.normal_regular,
        gc=args.gc,
        layers=layers,
    )
    print(f"pruned_ratio: {ratio:.4f}")
    print(f"cfg: {cfg}")
    if args.gc:
        # gc mode prints cfg only; retrain from scratch at these widths
        # (gc_prune.py:184-192)
        return 0
    new = ctor(cfg=cfg, rngs=nnx.Rngs(1))
    new = prune_model(model, new, masks, layers=layers)
    save_state(args.save, new, extra={"cfg": cfg})
    print(f"saved pruned model to {args.save}")
    return 0


def cmd_bn_fuse(args) -> int:
    from flax import nnx

    from .infer import fuse_bn_iao, fuse_bn_wbwtab
    from .nn import prepare
    from .train import load_state, save_state

    cfg = _quant_config(args)
    model = _build_model(args.model_type, _model_cfg(args), nnx.Rngs(0))
    q = prepare(model, cfg, method=args.method, inplace=True)
    if args.model:
        load_state(args.model, q)
    fused = (fuse_bn_iao if args.method == "iao" else fuse_bn_wbwtab)(q, cfg)
    save_state(args.save, fused)
    print(f"saved bn-fused inference model to {args.save}")
    if args.dump:
        from .infer.dump import dump_model_txt, dump_params_json

        base = args.save.rsplit(".", 1)[0]
        dump_model_txt(base + ".txt", fused)
        dump_params_json(base + "_para.json", fused)
        print(f"dumped parameters to {base}.txt / {base}_para.json")
    return 0


def cmd_model_test(args) -> int:
    import dataclasses

    from flax import nnx

    from .infer import (
        fuse_bn_iao,
        fuse_bn_wbwtab,
        paired_equivalence_eval,
        pre_quantize_weights,
    )
    from .nn import prepare, train_mode
    from .nn.transform import _copy_model
    from .train import data as data_lib
    from .train import load_state

    cfg = _quant_config(args)
    model = _build_model(args.model_type, _model_cfg(args), nnx.Rngs(0))
    q = prepare(model, cfg, method=args.method, inplace=True)
    if args.model:
        load_state(args.model, q)
    train_mode(q)
    if args.method == "dorefa":
        # dorefa pair (quant_model_para.py/quant_model_test.py): same
        # checkpoint in a quant_inference copy with weights pre-quantized
        fused = _copy_model(q)
        for _, mm in nnx.iter_modules(fused):
            if hasattr(mm, "quant_inference"):
                mm.quant_inference = True
        pre_quantize_weights(fused)
    else:
        fused = (fuse_bn_iao if args.method == "iao" else fuse_bn_wbwtab)(q, cfg)
    ds = data_lib.load_cifar10()
    acc_t, acc_i, fps_t, fps_i = paired_equivalence_eval(
        q, fused, ds.test_images, ds.test_labels, args.eval_batch_size
    )
    # the reference oracle is accuracy match PLUS FPS printed for both
    # models (quant_model_test.py:193-202)
    print(f"FPS: train {fps_t:.1f} inference {fps_i:.1f} (x{fps_i / max(fps_t, 1e-9):.2f})")
    ok = abs(acc_t - acc_i) < 0.005
    print("EQUIVALENCE", "OK" if ok else "MISMATCH")
    return 0 if ok else 1


def cmd_freeze_int(args) -> int:
    import jax.numpy as jnp
    from flax import nnx

    from .infer import freeze_int, fuse_bn_iao
    from .nn import eval_mode, prepare
    from .train import load_state, save_state

    cfg = _quant_config(args)
    model = _build_model(args.model_type, _model_cfg(args), nnx.Rngs(0))
    q = prepare(model, cfg, method="iao", inplace=True)
    if args.model:
        load_state(args.model, q)
    fused = fuse_bn_iao(q, cfg)
    eval_mode(fused)
    # example input activates the dataflow-traced chain planner, so
    # residual/concat graphs chain end to end (engine.py)
    engine = freeze_int(fused, example_input=jnp.zeros((1, 32, 32, 3), jnp.float32))
    save_state(args.save, engine)
    print(f"saved int8 engine (weights int8 + scale/zero_point) to {args.save}")
    return 0


def cmd_deploy(args) -> int:
    """Serialize a deployable engine artifact (reference eval_trt.py flow:
    checkpoint -> fused -> int engine -> serialized program + calibration
    table alongside)."""
    import jax.numpy as jnp
    from flax import nnx

    from .infer import freeze_int, fuse_bn_iao, serialize_engine
    from .nn import eval_mode, prepare
    from .train import load_state

    cfg = _quant_config(args)
    model = _build_model(args.model_type, _model_cfg(args), nnx.Rngs(0))
    q = prepare(model, cfg, method="iao", inplace=True)
    if args.model:
        load_state(args.model, q)
    fused = fuse_bn_iao(q, cfg)
    eval_mode(fused)
    engine = freeze_int(fused, example_input=jnp.zeros((1, 32, 32, 3), jnp.float32))
    platforms = tuple(args.platforms.split(",")) if args.platforms else None
    data = serialize_engine(
        engine, batch=args.batch, path=args.save, platforms=platforms
    )
    print(
        f"serialized engine ({len(data)} bytes, batch {args.batch}, "
        f"platforms {platforms or 'current'}) -> {args.save}"
    )
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="micronet_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    pt = sub.add_parser("train", help="QAT/PTQ/QAFT/float training")
    pt.add_argument("--method", choices=["iao", "dorefa", "wbwtab", "float"], default="iao")
    pt.add_argument("--model_type", type=int, default=1, help="0 nin, 1 nin_gc, 2 resnet18")
    pt.add_argument("--cfg", default="", help="comma list of channel widths (pruned models)")
    pt.add_argument("--lr", type=float, default=1e-3)
    pt.add_argument("--wd", type=float, default=1e-7)
    pt.add_argument("--train_batch_size", type=int, default=256)
    pt.add_argument("--epochs", type=int, default=300)
    pt.add_argument("--seed", type=int, default=1)
    pt.add_argument("--resume", default="", help="resume a quant checkpoint")
    pt.add_argument("--refine", default="", help="float checkpoint to warm-start from")
    pt.add_argument("--prune_quant", default="", help="pruned {cfg,state} FLOAT checkpoint to quantize")
    pt.add_argument("--prune_qaft", default="", help="pruned QUANT checkpoint to finetune with --qaft")
    pt.add_argument("--save", default="models_save/model.npz")
    pt.add_argument("-sr", dest="sr", action="store_true", help="sparsity train")
    pt.add_argument("--metrics", default="", help="JSONL metrics file (epoch/eval rows)")
    pt.add_argument("--grad_accum", type=int, default=1,
                    help="microbatches per optimizer step (memory-limited training)")
    pt.add_argument("--async_checkpoint", action="store_true",
                    help="write checkpoints on a background thread")
    pt.add_argument("--auto_resume", action="store_true",
                    help="resume from --save (or its .latest sibling, whichever "
                    "is newer) if present; also writes <save>.latest.npz every "
                    "epoch (preemption-safe restarts)")
    pt.add_argument("--s", type=float, default=1e-4, help="BN L1 lambda")
    _add_quant_flags(pt)
    pt.set_defaults(fn=cmd_train)

    pp = sub.add_parser("prune", help="BN-gamma channel pruning")
    pp.add_argument("--model_type", type=int, default=0)
    pp.add_argument("--cfg", default="")
    pp.add_argument("--model", default="")
    pp.add_argument("--save", default="models_save/pruned.npz")
    pp.add_argument("--percent", type=float, default=0.5)
    pp.add_argument("--normal_regular", type=int, default=1)
    pp.add_argument("--gc", action="store_true", help="grouped-conv mode")
    pp.set_defaults(fn=cmd_prune)

    pb = sub.add_parser("bn-fuse", help="export BN-fused inference model")
    pb.add_argument("--method", choices=["iao", "wbwtab"], default="iao")
    pb.add_argument("--model_type", type=int, default=1)
    pb.add_argument("--cfg", default="")
    pb.add_argument("--model", default="")
    pb.add_argument("--save", default="models_save/bn_fused.npz")
    pb.add_argument(
        "--dump",
        action="store_true",
        help="also write human-readable .txt + .json parameter dumps "
        "(reference bn_fuse.py:155-200)",
    )
    _add_quant_flags(pb)
    pb.set_defaults(fn=cmd_bn_fuse)

    pm = sub.add_parser("model-test", help="paired train/inference equivalence eval")
    pm.add_argument("--method", choices=["iao", "wbwtab", "dorefa"], default="iao")
    pm.add_argument("--model_type", type=int, default=1)
    pm.add_argument("--cfg", default="")
    pm.add_argument("--model", default="")
    pm.add_argument("--eval_batch_size", type=int, default=256)
    _add_quant_flags(pm)
    pm.set_defaults(fn=cmd_model_test)

    pf = sub.add_parser("freeze-int", help="export the int8 engine")
    pf.add_argument("--model_type", type=int, default=1)
    pf.add_argument("--cfg", default="")
    pf.add_argument("--model", default="")
    pf.add_argument("--save", default="models_save/int8_engine.npz")
    _add_quant_flags(pf)
    pf.set_defaults(fn=cmd_freeze_int)

    pd = sub.add_parser(
        "deploy", help="serialize a weights-embedded StableHLO engine artifact"
    )
    pd.add_argument("--model_type", type=int, default=1)
    pd.add_argument("--cfg", default="")
    pd.add_argument("--model", default="")
    pd.add_argument("--save", default="models_save/engine.stablehlo")
    pd.add_argument("--batch", type=int, default=32)
    pd.add_argument(
        "--platforms",
        default="",
        help="comma list of target platforms (e.g. 'tpu' to cross-build); "
        "default: current backend",
    )
    _add_quant_flags(pd)
    pd.set_defaults(fn=cmd_deploy)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
