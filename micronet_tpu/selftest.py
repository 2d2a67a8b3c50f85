"""Ship-with-the-package smoke tests (reference micronet/__init__.py:6-175).

``quant_test_manual`` builds LeNet-style nets with hand-placed quant
layers through all three flavors and runs a forward pass;
``quant_test_auto`` exercises ``prepare()`` for every method. Both print
"micronet_tpu is ready" on success — the reference's pass criterion.

Run: ``python -c "import micronet_tpu; micronet_tpu.quant_test_manual()"``
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx


def _input(batch: int = 2):
    return jnp.ones((batch, 32, 32, 3), jnp.float32)


def quant_test_manual() -> None:
    """Hand-assembled quant LeNets, one per flavor."""
    from .nn import modules as M
    from .nn import qat_dorefa, qat_iao, qat_wbwtab
    from .quant.config import QuantConfig

    rngs = nnx.Rngs(0)
    cfg = QuantConfig(a_bits=8, w_bits=8)

    class IaoLeNet(nnx.Module):
        def __init__(self):
            self.c1 = qat_iao.QuantConv2d(3, 6, 5, cfg=cfg, rngs=rngs)
            self.p1 = qat_iao.QuantMaxPool2d(2, 2, cfg=cfg)
            self.c2 = qat_iao.QuantConv2d(6, 16, 5, cfg=cfg, rngs=rngs)
            self.p2 = qat_iao.QuantAdaptiveAvgPool2d((5, 5), cfg=cfg)
            self.fc = qat_iao.QuantLinear(16 * 5 * 5, 10, cfg=cfg, rngs=rngs)

        def __call__(self, x):
            x = self.p1(jax.nn.relu(self.c1(x)))
            x = self.p2(jax.nn.relu(self.c2(x)))
            return self.fc(x.reshape(x.shape[0], -1))

    class DorefaLeNet(nnx.Module):
        def __init__(self):
            self.c1 = qat_dorefa.QuantConv2d(3, 6, 5, cfg=cfg, rngs=rngs)
            self.c2 = qat_dorefa.QuantConv2d(6, 16, 5, cfg=cfg, rngs=rngs)
            self.fc = qat_dorefa.QuantLinear(16 * 24 * 24, 10, cfg=cfg, rngs=rngs)

        def __call__(self, x):
            x = jax.nn.relu(self.c1(x))
            x = jax.nn.relu(self.c2(x))
            return self.fc(x.reshape(x.shape[0], -1))

    wcfg = QuantConfig(W=2, A=2)

    class WbwtabLeNet(nnx.Module):
        def __init__(self):
            self.c1 = qat_wbwtab.QuantConv2d(3, 6, 5, cfg=wcfg, rngs=rngs)
            self.a1 = qat_wbwtab.ActivationQuantizer(A=2)
            self.c2 = qat_wbwtab.QuantConv2d(6, 16, 5, cfg=wcfg, rngs=rngs)
            self.fc = M.Linear(16 * 24 * 24, 10, rngs=rngs)

        def __call__(self, x):
            x = self.a1(self.c1(x))
            x = self.c2(x)
            return self.fc(x.reshape(x.shape[0], -1))

    for name, net in (
        ("iao", IaoLeNet()),
        ("dorefa", DorefaLeNet()),
        ("wbwtab", WbwtabLeNet()),
    ):
        out = net(_input())
        assert out.shape == (2, 10), (name, out.shape)
    print("micronet_tpu is ready")


def quant_test_auto() -> None:
    """prepare() smoke over every flavor on the stock LeNet, plus the
    serving kit (weight-only int4, int8 KV decoder) and KL calibration."""
    import jax.numpy as jnp

    from .models import LeNet
    from .nn import prepare
    from .quant.config import QuantConfig

    for method, cfg in (
        ("iao", QuantConfig(a_bits=8, w_bits=8)),
        ("iao", QuantConfig(a_bits=8, w_bits=8, bn_fuse=True)),
        ("dorefa", QuantConfig(a_bits=8, w_bits=8)),
        ("wbwtab", QuantConfig(W=2, A=2)),
        ("iao", QuantConfig(a_bits=8, w_bits=8, ptq=True, ptq_observer="kl")),
    ):
        model = LeNet(rngs=nnx.Rngs(0))
        q = prepare(model, cfg, method=method)
        out = q(_input())
        assert out.shape == (2, 10), (method, out.shape)

    # serving kit smoke: W4-grouped decoder with int8 KV cache
    from .models.tiny_decoder import TinyDecoder, quantize_decoder

    dec = quantize_decoder(
        TinyDecoder(vocab=16, dim=16, heads=2, depth=1, mlp_dim=32, max_seq=8,
                    rngs=nnx.Rngs(0)),
        group=8,
    )
    logits, _ = dec.forward(
        jnp.zeros((2,), jnp.int32), dec.init_cache(), jnp.int32(0)
    )
    assert logits.shape == (2, 16)
    print("micronet_tpu is ready")
