"""End-to-end QAT -> BN-fuse -> int8 engine on CIFAR-10 (or the synthetic
stand-in when the dataset is not on disk).

Run:  python examples/qat_cifar10.py [--epochs 30] [--dp N]

Covers the full reference workflow (SURVEY.md §3.1 + §3.5): IAO W8A8 QAT
with in-training BN fusion, best-acc checkpoints, paired train/inference
equivalence, and the integer engine export — optionally data-parallel
over N devices.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from flax import nnx


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--dp", type=int, default=1, help="data-parallel devices")
    ap.add_argument("--save", default="models_save/nin_gc_w8a8.npz")
    args = ap.parse_args()

    from micronet_tpu.infer import freeze_int, fuse_bn_iao, paired_equivalence_eval
    from micronet_tpu.models import nin_gc
    from micronet_tpu.nn import prepare, train_mode
    from micronet_tpu.parallel import make_mesh
    from micronet_tpu.quant.config import QuantConfig
    from micronet_tpu.train import TrainConfig, Trainer

    cfg = QuantConfig(a_bits=8, w_bits=8, bn_fuse=True)
    model = prepare(nin_gc.Net(rngs=nnx.Rngs(1)), cfg, method="iao", inplace=True)
    train_mode(model)

    mesh = make_mesh(data=args.dp) if args.dp > 1 else None
    trainer = Trainer(
        model, TrainConfig(lr=1e-3, batch_size=args.batch, epochs=args.epochs),
        mesh=mesh,
    )
    if trainer.data.source == "synthetic":
        print("NOTE: CIFAR-10 not found (set CIFAR10_DIR); using synthetic data")
    best = trainer.fit(checkpoint_path=args.save)
    print(f"best acc {best * 100:.2f}%")

    fused = fuse_bn_iao(model, cfg)
    acc_t, acc_i, fps_t, fps_i = paired_equivalence_eval(
        model, fused, trainer.data.test_images, trainer.data.test_labels
    )
    print(f"FPS: train {fps_t:.1f} inference {fps_i:.1f}")
    assert abs(acc_t - acc_i) < 0.005, "train/inference equivalence violated"

    engine = freeze_int(fused)
    from micronet_tpu.train import save_state

    save_state(args.save.replace(".npz", "_int8.npz"), engine)
    print("int8 engine exported")


if __name__ == "__main__":
    main()
