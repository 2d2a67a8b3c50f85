"""Benchmark: flagship quantized inference throughput on the current chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "detail": {...}}

Headline: NIN-GC IAO **W4A4** (bn-fused, nibble-packed weights, int engine)
images/sec at batch 1024 vs the same model's FP32 eval throughput — the
BASELINE.json headline config. The reference's "FPS improves after
deployment conversion" oracle
(dorefa/quant_model_test/quant_model_test.py:28-65) made quantitative;
the reference publishes no absolute throughput numbers (SURVEY.md §6).

BUDGETED (VERDICT r3 item 1: the round-3 bench timed out in the driver,
rc=124, and shipped zero verified numbers): every section runs under a
global wall-clock budget (default 400 s, env ``BENCH_BUDGET_S``).
Sections execute in priority order; a section that would not fit is
skipped and recorded in ``detail.skipped_sections`` — the headline JSON
ALWAYS prints. Section costs are dominated by XLA compiles (~10-40 s
each on this tunneled chip), so the budget checks run between compiles,
not between timed iterations.

`detail` captures (when budget allows):
  - W8A8 engine + fake-quant throughput (rounds 1-2 continuity),
  - ResNet18 int8 engine vs fp32 (residual graphs through the
    dataflow-traced chain planner, IntAdd union-scale path),
  - QAT training-step throughput (fp32 / IAO W4A4 bn_fuse, plus W8A8
    variants when time remains),
  - the weight-only int4 W4A16 Pallas decode kernel vs bf16 matmul at a
    Llama-3-8B MLP shape (M in {1, 8}; streaming + resident regimes),
  - a Llama-8B-shaped W4+int8-KV decode step vs bf16.

All timings use the slope-based on-device harness in
micronet_tpu.utils.timing (naive wall-clock lies in this environment:
launch RPC overhead + execution-result caching).
"""

import json
import os
import time

import jax

# persistent XLA compilation cache: the bench's cost is ~90% compiles
# (9-layer quantized convnets + scan timing harnesses, 20-60 s each on
# the tunneled chip). The cache is keyed by HLO, so any earlier run of
# this same file (builder validation, a previous round) makes the driver
# run compile-free and the whole suite fits far inside the budget.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
from flax import nnx

T0 = time.time()
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "400"))
# the headline section's HARD sub-budget (VERDICT r4 item 5: on a slow
# tunnel the fixed-size headline ate ~60% of the budget and the tail
# sections were dropped wholesale; now the headline shrinks its iteration
# counts to fit this fraction, and the tail runs LEAN variants instead of
# skipping)
HEADLINE_FRAC = 0.40


def _remaining() -> float:
    return BUDGET_S - (time.time() - T0)


import contextlib


def _cpu_build():
    """Context that routes EAGER build work (prepare/seed/fuse/freeze —
    hundreds of tiny per-layer device ops) to the LOCAL CPU backend:
    through a degraded tunnel the same work is minutes of per-op round
    trips (measured: fuse 58 s + freeze 100 s on-chip vs seconds on
    CPU). The built state ships to the chip once, in _eval_fps."""
    try:
        return jax.default_device(jax.devices("cpu")[0])
    except Exception:  # no CPU backend registered: build on default
        return contextlib.nullcontext()


def _eval_fps(model, x, iters=64):
    from micronet_tpu.utils import throughput

    gdef, state = nnx.split(model)
    # one h2d transfer of the (possibly CPU-built) params — the timed
    # jit must run on the chip with device-resident state
    state = jax.device_put(state, jax.devices()[0])
    fps, _ = throughput(lambda s, xi: nnx.merge(gdef, s)(xi), state, x, iters=iters)
    return fps


def _seed_scales(q):
    """Seed every quantizer's observer range + qparams directly instead of
    running calibration forwards. Throughput is INDEPENDENT of the scale
    VALUES (same ops either way); the round-3 bench spent its driver
    budget compiling the train-mode QAT graph (double conv + observers +
    STE) just to make scales 'realistic' — ~8 minutes of compile for
    numbers the timing never reads. Weight scales come from the actual
    absmax (cheap eager reductions), activation ranges from a nominal
    ±3 — so the frozen engine is structurally identical to a calibrated
    one (same dtypes, same chains, same clip ranges)."""
    import jax.numpy as jnp

    from micronet_tpu.quant.quantizers import (
        asymmetric_qparams,
        symmetric_qparams,
    )

    def seed(quant, min_v, max_v):
        quant.min_val[...] = jnp.broadcast_to(
            jnp.asarray(min_v, jnp.float32), quant.min_val[...].shape
        )
        quant.max_val[...] = jnp.broadcast_to(
            jnp.asarray(max_v, jnp.float32), quant.max_val[...].shape
        )
        fn = symmetric_qparams if quant.symmetric else asymmetric_qparams
        s, zp = fn(
            quant.min_val[...], quant.max_val[...], quant.qmin, quant.qmax
        )
        quant.scale[...] = s
        quant.zero_point[...] = zp

    for _, m in nnx.iter_modules(q):
        aq = getattr(m, "activation_quantizer", None)
        if aq is not None and hasattr(aq, "scale"):
            seed(aq, -3.0, 3.0)
        wq = getattr(m, "weight_quantizer", None)
        w = getattr(m, "weight", None)
        if wq is not None and hasattr(wq, "scale") and w is not None:
            wv = w[...]
            mshape = wq.min_val[...].shape
            import numpy as _np

            if int(_np.prod(mshape)) == wv.shape[-1]:
                # per-out-channel ("C"/"FC"): reduce all axes but the last
                lo = jnp.min(wv, axis=tuple(range(wv.ndim - 1)))
                hi = jnp.max(wv, axis=tuple(range(wv.ndim - 1)))
            else:  # per-layer ("L") scalar
                lo = jnp.min(wv)
                hi = jnp.max(wv)
            seed(wq, lo.reshape(mshape), hi.reshape(mshape))


def _bench_nin_gc(detail):
    """NIN-GC engine throughput at the BASELINE headline config (W4A4) and
    — budget permitting — the W8A8 comparison point, both vs the same
    model's FP32 eval.

    Runs under a HARD sub-budget of ``HEADLINE_FRAC * BUDGET_S``: each
    measurement picks its iteration count from the time actually left in
    the sub-budget (a degraded tunnel gets fewer, noisier iters — but
    the tail sections still get their share of the budget). The W8A8
    extras only run with sub-budget to spare."""
    from micronet_tpu.infer import freeze_int, fuse_bn_iao
    from micronet_tpu.models import nin_gc
    from micronet_tpu.nn import eval_mode, prepare, train_mode
    from micronet_tpu.quant.config import QuantConfig

    hl_deadline = T0 + HEADLINE_FRAC * BUDGET_S

    def hl_left() -> float:
        return hl_deadline - time.time()

    def hl_iters() -> int:
        # ONE fixed iteration count: adaptive tiers produce distinct
        # timing-harness HLO per tier, so a slow tunnel missed the
        # compile cache exactly when it could least afford to (a 289 s
        # headline on the r5 validation run). 48 iters is ample slope
        # signal; the sub-budget now only gates the W8A8 extras.
        return 48

    batch = 1024
    x = jax.random.normal(jax.random.PRNGKey(0), (batch, 32, 32, 3), jnp.float32)

    with _cpu_build():
        fp_model = nin_gc.Net(rngs=nnx.Rngs(0))
        eval_mode(fp_model)
    fps_fp = _eval_fps(fp_model, x, iters=hl_iters())

    def build_engine(a_bits, w_bits):
        with _cpu_build():
            cfg = QuantConfig(a_bits=a_bits, w_bits=w_bits, bn_fuse=True)
            q = prepare(nin_gc.Net(rngs=nnx.Rngs(0)), cfg, method="iao")
            _seed_scales(q)
            fused = fuse_bn_iao(q, cfg)
            eval_mode(fused)
            engine = freeze_int(
                fused, example_input=jnp.zeros((1, 32, 32, 3), jnp.float32)
            )
            eval_mode(engine)
        return engine, fused

    engine4, _ = build_engine(4, 4)
    fps_w4a4 = _eval_fps(engine4, x, iters=hl_iters())
    detail.update(
        fp32_img_s=round(fps_fp, 1),
        int_engine_w4a4_img_s=round(fps_w4a4, 1),
    )
    # W8A8 engine + fake-quant points cost two more compiles — only with
    # headline sub-budget to spare (the headline never depends on them)
    if hl_left() > 75:
        engine8, fused8 = build_engine(8, 8)
        fps_w8a8 = _eval_fps(engine8, x, iters=hl_iters())
        detail.update(
            int_engine_w8a8_img_s=round(fps_w8a8, 1),
            w8a8_vs_fp32=round(fps_w8a8 / fps_fp, 3),
        )
        if hl_left() > 40:
            fps_fq = _eval_fps(fused8, x, iters=hl_iters())
            detail["fake_quant_img_s"] = round(fps_fq, 1)
    return fps_w4a4, fps_fp


def _bench_resnet18(detail, lean=False):
    from micronet_tpu.infer import freeze_int, fuse_bn_iao
    from micronet_tpu.models import resnet18
    from micronet_tpu.nn import eval_mode, prepare, train_mode
    from micronet_tpu.quant.config import QuantConfig

    batch = 256 if lean else 512
    iters = 12 if lean else 64
    x = jax.random.normal(jax.random.PRNGKey(0), (batch, 32, 32, 3), jnp.float32)

    with _cpu_build():
        fp_model = resnet18(rngs=nnx.Rngs(0))
        eval_mode(fp_model)
    fps_fp = _eval_fps(fp_model, x, iters=iters)

    with _cpu_build():
        cfg = QuantConfig(a_bits=8, w_bits=8, bn_fuse=True)
        q = prepare(resnet18(rngs=nnx.Rngs(0)), cfg, method="iao")
        _seed_scales(q)
        fused = fuse_bn_iao(q, cfg)
        eval_mode(fused)
        engine = freeze_int(
            fused, example_input=jnp.zeros((1, 32, 32, 3), jnp.float32)
        )
        eval_mode(engine)
    fps_e = _eval_fps(engine, x, iters=iters)

    detail.update(
        resnet18_fp32_img_s=round(fps_fp, 1),
        resnet18_int8_img_s=round(fps_e, 1),
        resnet18_int8_vs_fp32=round(fps_e / fps_fp, 3),
    )


def _bench_train(detail, lean=False):
    import optax

    from micronet_tpu.models import nin_gc
    from micronet_tpu.nn import prepare, train_mode
    from micronet_tpu.quant.config import QuantConfig

    from micronet_tpu.utils.timing import train_step_seconds

    batch = 256

    def measure(method, cfg, iters=12 if lean else 24):
        model = nin_gc.Net(rngs=nnx.Rngs(0))
        if method:
            model = prepare(model, cfg, method=method, inplace=True)
        train_mode(model)
        opt = nnx.Optimizer(model, optax.adam(1e-3), wrt=nnx.Param)
        gdef, state = nnx.split((model, opt))
        x = jax.random.normal(jax.random.PRNGKey(0), (batch, 32, 32, 3))
        y = jax.random.randint(jax.random.PRNGKey(1), (batch,), 0, 10)

        def step(st, xi, yi):
            m, o = nnx.merge(gdef, st)

            def loss_fn(m):
                return jnp.mean(
                    optax.softmax_cross_entropy_with_integer_labels(m(xi), yi)
                )

            loss, grads = nnx.value_and_grad(loss_fn)(m)
            o.update(m, grads)
            _, st2 = nnx.split((m, o))
            return st2, loss

        sec = train_step_seconds(step, state, x, y, iters=iters)
        return batch / sec

    # the two headline training points; W8A8 variants only if they fit
    detail["train_fp32_img_s"] = round(measure(None, None), 1)
    detail["train_iao_w4a4_bnfuse_img_s"] = round(
        measure("iao", QuantConfig(a_bits=4, w_bits=4, bn_fuse=True)), 1
    )
    if not lean and _remaining() > 120:
        detail["train_iao_w8a8_img_s"] = round(
            measure("iao", QuantConfig(a_bits=8, w_bits=8)), 1
        )
    if not lean and _remaining() > 120:
        detail["train_iao_bnfuse_img_s"] = round(
            measure("iao", QuantConfig(a_bits=8, w_bits=8, bn_fuse=True)), 1
        )


def _bench_int4(detail, lean=False):
    """hl8 W4A16 grouped kernel at the Llama-3-8B up-proj shape, M in
    {1, 8}, two measurement regimes (docs/design.md round 3; round 4
    trims M=16 and the trial counts to fit the driver budget):

    - STREAMING: 8 distinct weight buffers cycled in an unrolled chain,
      so every step reads its weights from cold HBM — the serving model
      (every layer streams once per token). Roofline fractions against
      the HBM weight-read bound use THIS number (north star: >= 80%).
    - SINGLE-BUFFER ("resident"): one weight buffer reused across the
      scan — the best case (warm paths, no buffer cycling).

    ``lean=True`` (degraded-tunnel fallback) keeps M=1 only with fewer
    trials/iters — the roofline fraction still lands, just noisier.

    Roofline honesty: ``_roofline`` fractions use the chip's NOMINAL
    bandwidth (819 GB/s on v5e); ``_roofline_achieved`` divides by the
    bandwidth a pure read-stream actually reaches on this chip/tunnel
    (measured here, reported as ``hbm_read_gbps_measured``) — the
    speed-of-light a kernel could possibly hit.
    """
    import time as _time

    from micronet_tpu.ops.int4_matmul import (
        int4_matmul_grouped_hl8,
        pack_int4_hl8,
        quantize_int4_weight_grouped,
    )
    from micronet_tpu.utils.profiling import roofline
    from micronet_tpu.utils.timing import per_step_seconds

    # measured achievable read bandwidth: a 64 MiB read-stream (the scan
    # harness sums the result, so the output write is fused away — pure
    # read traffic)
    rbuf = jax.random.normal(jax.random.PRNGKey(9), (16 * 2**20,), jnp.float32)
    rsec = per_step_seconds(
        lambda s, xi: s + xi[0], rbuf, jnp.ones((8,), jnp.float32),
        iters=256 if lean else 512,
    )
    read_gbps = rbuf.size * 4 / rsec / 1e9
    detail["hbm_read_gbps_measured"] = round(read_gbps, 0)

    k, n, g = 4096, 14336, 128  # Llama-3-8B MLP up-projection
    copies = 8
    w = jax.random.normal(jax.random.PRNGKey(1), (k, n), jnp.float32) * 0.02
    w_q, gscale = quantize_int4_weight_grouped(w, g)
    packed = pack_int4_hl8(w_q)
    wb = w.astype(jnp.bfloat16)
    packs = [packed + (i % 2) for i in range(copies)]
    gss = [gscale] * copies

    def stream_seconds(m):
        import numpy as np

        x = jax.random.normal(jax.random.PRNGKey(0), (m, k), jnp.float32)

        def make(kk):
            @jax.jit
            def run(packs, gss, x, seed):
                def body(carry, i):
                    acc = carry
                    xi = x * (1.0 + 1e-12 * acc) + seed.astype(jnp.float32) * 1e-6
                    for c in range(copies):  # unrolled: static operands
                        y = int4_matmul_grouped_hl8(xi, packs[c], gss[c])
                        acc = acc + jnp.float32(jnp.sum(y))
                        xi = x * (1.0 + 1e-12 * acc)
                    return acc, None

                tot, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(kk))
                return tot

            return run

        # (8, 48) scan counts x 8 unrolled copies = 320 kernel steps of
        # separation (~16-50 ms of slope signal vs ~10 ms RPC jitter;
        # round-3's (8, 72) x 5 trials was accurate but blew the driver
        # budget — 3 trials at (8, 48) keeps the median stable)
        ks = (8, 32) if lean else (8, 48)
        runners = {kk: make(kk) for kk in ks}
        for kk in ks:
            np.asarray(runners[kk](packs, gss, x, jnp.int32(0)))
        slopes = []
        for t in range(2 if lean else 3):
            t0 = _time.perf_counter()
            np.asarray(runners[ks[0]](packs, gss, x, jnp.int32(100 + t)))
            ts = _time.perf_counter() - t0
            t0 = _time.perf_counter()
            np.asarray(runners[ks[1]](packs, gss, x, jnp.int32(200 + t)))
            tl = _time.perf_counter() - t0
            slopes.append((tl - ts) / (ks[1] - ks[0]) / copies)
        slopes.sort()
        return slopes[len(slopes) // 2]

    for m in ((1,) if lean else (1, 8)):
        if m != 1 and _remaining() < 150:
            detail["int4_skipped_m"] = m
            break
        # iters=512: ~380 steps of separation x ~50-160 µs/step = 20-60 ms
        # of slope signal, well above the ~10 ms RPC jitter of the
        # tunneled chip
        x = jax.random.normal(jax.random.PRNGKey(0), (m, k), jnp.float32)
        sec_bf16 = per_step_seconds(
            lambda s, xi: (xi.astype(jnp.bfloat16) @ s).astype(jnp.float32),
            wb, x, iters=256 if lean else 512,
        )
        sec_res = per_step_seconds(
            lambda s, xi: int4_matmul_grouped_hl8(xi, s[0], s[1]),
            (packed, gscale), x, iters=256 if lean else 512,
        )
        sec_str = stream_seconds(m)
        bytes_r = k // 2 * n + (k // g) * n * 4 + m * k * 4 + m * n * 4
        rf = roofline(sec_str, flops=2 * m * k * n, bytes_accessed=bytes_r)
        detail[f"int4_hl8_m{m}_us"] = round(sec_str * 1e6, 1)
        detail[f"int4_hl8_m{m}_roofline"] = round(rf["fraction_of_roofline"], 2)
        detail[f"int4_hl8_m{m}_roofline_achieved"] = round(
            bytes_r / read_gbps / 1e9 / sec_str, 2
        )
        detail[f"int4_hl8_m{m}_vs_bf16"] = round(sec_bf16 / sec_str, 2)
        detail[f"int4_hl8_m{m}_resident_us"] = round(sec_res * 1e6, 1)
        detail[f"int4_hl8_m{m}_resident_vs_bf16"] = round(sec_bf16 / sec_res, 2)
        if m == 8:
            detail["bf16_matmul_us"] = round(sec_bf16 * 1e6, 1)


def _bench_llm_decode(detail, lean=False):
    """One Llama-8B-shaped decode step: W4 grouped weights + int8 KV vs
    bf16 weights + bf16 KV (benchmarks/llm_decode.py, condensed)."""
    import importlib.util
    import os as _os

    spec = importlib.util.spec_from_file_location(
        "llm_decode",
        _os.path.join(_os.path.dirname(__file__), "benchmarks", "llm_decode.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    from micronet_tpu.ops.int4_matmul import (
        pack_int4_hl8,
        quantize_int4_weight_grouped,
    )
    from micronet_tpu.quant.kv_cache import append_kv, init_kv_cache
    from micronet_tpu.utils.timing import per_step_seconds

    key = jax.random.PRNGKey(0)
    ws = mod.build_weights(key)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, mod.DIM), jnp.float32)
    params = {}
    for n, w in ws.items():
        wq, gs = quantize_int4_weight_grouped(w, 128)
        params[n] = (pack_int4_hl8(wq), gs)
    cache = init_kv_cache(mod.HEADS, mod.SEQ, mod.HEAD_DIM)
    fk = jax.random.normal(jax.random.PRNGKey(2), (mod.HEADS, mod.SEQ - 1, mod.HEAD_DIM))
    fv = jax.random.normal(jax.random.PRNGKey(3), (mod.HEADS, mod.SEQ - 1, mod.HEAD_DIM))
    cache = append_kv(cache, fk, fv)
    sec_q = per_step_seconds(
        lambda s, xi: mod.decode_step_w4(s[0], s[1], xi)[0], (params, cache), x,
        iters=64 if lean else 192,
    )
    detail["decode_w4_int8kv_us"] = round(sec_q * 1e6, 1)
    if not lean and _remaining() > 90:
        wsb = {n: w.astype(jnp.bfloat16) for n, w in ws.items()}
        sec_b = per_step_seconds(
            lambda s, xi: mod.decode_step_bf16(s[0], s[1], s[2], xi),
            (wsb, fk.astype(jnp.bfloat16), fv.astype(jnp.bfloat16)),
            x,
            iters=192,
        )
        detail.update(
            decode_bf16_us=round(sec_b * 1e6, 1),
            decode_w4_vs_bf16=round(sec_b / sec_q, 2),
        )


def _bench_attn_s8k(detail, lean=False):
    """Long-context decode attention: the S-blocked online-softmax kernel
    at S=8192 (cache no longer VMEM-resident) vs the whole-cache kernel
    at S=2048 — the serving-realism row (VERDICT r3 item 8). 8 KV heads,
    D=128, GQA R=4: one Llama-3-8B layer's decode attention."""
    from micronet_tpu.ops.decode_attention import decode_attend_q8kv
    from micronet_tpu.quant.kv_cache import append_kv, init_kv_cache
    from micronet_tpu.utils.timing import per_step_seconds

    g, d, r = 8, 128, 4
    shapes = ((8192, "s8k"),) if lean else ((2048, "s2k"), (8192, "s8k"))
    for s, tag in shapes:
        fill = s - 1
        cache = append_kv(
            init_kv_cache(g, s, d),
            jax.random.normal(jax.random.PRNGKey(1), (g, fill, d)),
            jax.random.normal(jax.random.PRNGKey(2), (g, fill, d)),
        )
        q = jax.random.normal(jax.random.PRNGKey(3), (g, r, d))
        bound = jnp.full((g,), fill, jnp.int32)
        # ALWAYS go through the dispatcher: at S=8192 it picks the
        # S-blocked kernel with the largest block (2048) — the round-4
        # bench called the blocked kernel directly and silently measured
        # its default block_s=1024 (~2/3 the bandwidth of 2048)
        fn = decode_attend_q8kv
        sec = per_step_seconds(
            lambda st, qi: fn(st[0], st[1], st[2], st[3], qi, st[4]),
            (cache.k_codes, cache.k_scale[..., 0], cache.v_codes,
             cache.v_scale[..., 0], bound),
            q, iters=256 if lean else 512,
        )
        bytes_r = 2 * g * s * d + 2 * g * s * 4  # codes + scales
        detail[f"attn_{tag}_us"] = round(sec * 1e6, 1)
        detail[f"attn_{tag}_gbps"] = round(bytes_r / sec / 1e9, 0)


def _bench_paged_attn(detail, lean=False):
    """Paged-KV serving economics (VERDICT r4 items 1b + 8): the paged
    decode-attention kernel over a RAGGED batch vs the dense S-blocked
    kernel over the slots*max_seq cache.

    - ``paged_ragged_us`` / ``paged_hbm_ratio``: 8 slots whose actual
      lengths sum to ~1/5 of 8 x 8192 — the paged kernel's HBM traffic
      (and, with the tail-clamped index_map eliding zero-page DMAs, its
      time) scales with the ACTUAL pages, the dense kernel's with
      slots*max_seq.
    - ``paged_full_vs_dense``: every slot full — the paged layout's
      overhead at equal work (target: within ~10% of dense).
    """
    from micronet_tpu.ops.paged_attention import paged_decode_attend
    from micronet_tpu.ops.decode_attention import decode_attend_q8kv_blocked
    from micronet_tpu.quant.kv_cache import append_kv, init_kv_cache
    from micronet_tpu.quant.paged_kv import (
        init_paged_kv,
        paged_insert_from_dense,
    )
    from micronet_tpu.utils.timing import per_step_seconds

    h, d, r = 8, 128, 4
    # page=1024: the TPU-side sweet spot (a (page, D) int8 block is a
    # 128 KB DMA; page=512 measured 2x the grid-step overhead — 1024
    # grid steps of ~0.5 us dominated the ragged run)
    slots, page, mp = 8, 1024, 8  # 8 slots x 8192 logical rows
    s = mp * page
    iters = 128 if lean else 256
    # dense per-slot caches (slots*h, S, D) — the dense serving layout
    fill = s - 1
    key = jax.random.PRNGKey(0)
    k = jax.random.normal(key, (slots * h, fill, d))
    dense = append_kv(init_kv_cache(slots * h, s, d), k, k)
    q = jax.random.normal(jax.random.PRNGKey(1), (slots, h, r, d))

    ragged = [s, s // 4, s // 8, 512, 512, 512, 512, 512]  # 13824 of 65536 rows
    for lengths, tag in (
        (ragged, "ragged"),
        ([s] * slots, "full"),
    ):
        if tag == "full" and lean:
            break
        total_pages = sum(-(-ln // page) for ln in lengths)
        pool = init_paged_kv(1 + total_pages, page, h, d, slots, mp)
        for si, ln in enumerate(lengths):
            pool = paged_insert_from_dense(
                pool, si,
                dense.k_codes[si * h : (si + 1) * h],
                dense.k_scale[si * h : (si + 1) * h, :, 0],
                dense.v_codes[si * h : (si + 1) * h],
                dense.v_scale[si * h : (si + 1) * h, :, 0],
                jnp.int32(ln),
            )
        sec = per_step_seconds(
            lambda st, qi: paged_decode_attend(
                st[0], st[1], st[2], st[3], st[4], st[5], qi
            ),
            (pool.k_codes, pool.k_scale, pool.v_codes, pool.v_scale,
             pool.page_table, pool.lengths),
            q, iters=iters,
        )
        bytes_actual = total_pages * (2 * h * page * d + 2 * h * page * 4)
        detail[f"paged_{tag}_us"] = round(sec * 1e6, 1)
        detail[f"paged_{tag}_gbps"] = round(bytes_actual / sec / 1e9, 0)
        if tag == "ragged":
            dense_bytes = slots * h * (2 * s * d + 2 * s * 4)
            detail["paged_hbm_ratio"] = round(bytes_actual / dense_bytes, 3)
        else:
            bound = jnp.full((slots * h,), fill, jnp.int32)
            sec_d = per_step_seconds(
                lambda st, qi: decode_attend_q8kv_blocked(
                    st[0], st[1], st[2], st[3], qi, st[4], block_s=2048
                ),
                (dense.k_codes, dense.k_scale[..., 0], dense.v_codes,
                 dense.v_scale[..., 0], bound),
                q.reshape(slots * h, r, d), iters=iters,
            )
            detail["dense_full_us"] = round(sec_d * 1e6, 1)
            detail["paged_full_vs_dense"] = round(sec_d / sec, 2)


def main():
    detail = {"budget_s": BUDGET_S}
    skipped = []
    best, fps_fp = _bench_nin_gc(detail)
    # (section, full-cost estimate, lean-cost estimate) in seconds —
    # dominated by compiles. A section runs FULL only if doing so leaves
    # every later section its lean minimum; it runs LEAN otherwise, and
    # is skipped only when even the lean variant cannot fit (VERDICT r4
    # item 5: degraded tunnels must shrink sections, not drop them)
    sections = [
        (_bench_int4, 110, 60),
        (_bench_llm_decode, 70, 35),
        (_bench_attn_s8k, 40, 20),
        (_bench_paged_attn, 50, 25),
        (_bench_resnet18, 60, 28),
        (_bench_train, 80, 45),
    ]
    # estimates are calibrated for a median tunnel day; a degraded one
    # (cold compiles at 60-90 s) makes every section run over, so the
    # scheduler LEARNS the day's slowdown from the sections already run
    # and scales the remaining estimates by it — a 3x-slow day drops
    # tail sections (recorded) instead of blowing the wall-clock budget
    est_spent = 0.0
    act_spent = 0.0
    for idx, (section, full_est, lean_est) in enumerate(sections):
        name = section.__name__
        slow = max(1.0, act_spent / est_spent) if est_spent > 0 else 1.0
        tail_lean = sum(le for _, _, le in sections[idx + 1 :])
        if _remaining() >= (full_est + tail_lean) * slow:
            lean = False
            est = full_est
        elif _remaining() >= lean_est * slow:
            lean = True
            est = lean_est
        else:
            skipped.append(name)
            continue
        t0 = time.time()
        try:
            section(detail, lean=lean)
        except Exception as e:  # keep the headline metric robust
            detail[name + "_error"] = repr(e)[:200]
        detail[name + "_s"] = round(time.time() - t0, 1)
        est_spent += est
        act_spent += time.time() - t0
        if lean:
            detail[name + "_lean"] = True
    detail["tunnel_slow_factor"] = round(
        max(1.0, act_spent / est_spent) if est_spent else 1.0, 2
    )

    detail["skipped_sections"] = skipped
    detail["elapsed_s"] = round(time.time() - T0, 1)
    print(
        json.dumps(
            {
                "metric": "nin_gc_w4a4_inference_throughput",
                "value": round(best, 1),
                "unit": "img/s",
                "vs_baseline": round(best / fps_fp, 3),
                "detail": detail,
            }
        )
    )


if __name__ == "__main__":
    main()
