"""One-command reproduction of the round-4 ON-HARDWARE validations.

The CPU suite (conftest re-points to an 8-device CPU mesh) cannot catch
Mosaic lowering rejections, pathological XLA layouts, or TPU-default
precision semantics — three bug classes found and fixed this round. This
script re-runs every hardware check on the real chip:

  1. S-blocked decode attention (S=8192, ragged bounds) vs XLA oracle
  2. S-blocked deferred-append variant vs oracle
  3. whole-cache deferred-append kernel vs oracle (the decode_batch path
     that previously failed Mosaic verification via N=1 bf16 dots)
  4. ServeLoop continuous batching == isolated generate(), token-exact,
     real fused kernels (head_dim 128)
  5. Llama.decode_batch at max_seq=8192 (auto-dispatched blocked_cur)
     vs per-request forward decode
  6. paged-attention kernel (scalar-prefetched page table) vs the
     gather+dense oracle, ragged slots

Run:  python benchmarks/onchip_checks.py      (requires the TPU backend)
Exit 0 = every check passed; each check prints its measured bound.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx


def check(name):
    def deco(fn):
        t0 = time.time()
        fn()
        print(f"[onchip] {name}: PASS ({time.time() - t0:.0f}s)", flush=True)

    return deco


def main():
    assert jax.default_backend() == "tpu", (
        f"needs the TPU backend, got {jax.default_backend()}"
    )
    from micronet_tpu.ops.decode_attention import (
        decode_attend_q8kv_blocked,
        decode_attend_q8kv_blocked_cur,
        decode_attend_q8kv_cur,
        decode_attend_q8kv_cur_xla,
        decode_attend_q8kv_xla,
    )
    from micronet_tpu.quant.kv_cache import (
        append_kv,
        init_kv_cache,
        quantize_kv_rows,
    )

    g, s, d, r = 8, 8192, 128, 4
    cache = append_kv(
        init_kv_cache(g, s, d),
        jax.random.normal(jax.random.PRNGKey(1), (g, 7000, d)),
        jax.random.normal(jax.random.PRNGKey(2), (g, 7000, d)),
    )
    q = jax.random.normal(jax.random.PRNGKey(3), (g, r, d))
    bound = jnp.asarray([7000, 5555, 4096, 100, 7000, 1, 2048, 6500], jnp.int32)
    args = (
        cache.k_codes, cache.k_scale[..., 0], cache.v_codes,
        cache.v_scale[..., 0], q, bound,
    )
    kcur, kcs = quantize_kv_rows(jax.random.normal(jax.random.PRNGKey(7), (g, d)))
    vcur, vcs = quantize_kv_rows(jax.random.normal(jax.random.PRNGKey(8), (g, d)))
    cargs = args + (kcur, kcs[:, 0], vcur, vcs[:, 0])

    @check("blocked S=8192 vs oracle")
    def _():
        out = decode_attend_q8kv_blocked(*args, block_s=2048)
        ref = decode_attend_q8kv_xla(*args)
        md = float(jnp.max(jnp.abs(out - ref)))
        print(f"  maxdiff {md:.2e}", flush=True)
        assert md < 2e-3, md

    @check("blocked_cur S=8192 vs oracle")
    def _():
        out = decode_attend_q8kv_blocked_cur(*cargs, block_s=2048)
        ref = decode_attend_q8kv_cur_xla(*cargs)
        md = float(jnp.max(jnp.abs(out - ref)))
        print(f"  maxdiff {md:.2e}", flush=True)
        assert md < 2e-3, md

    @check("whole-cache cur kernel vs oracle (Mosaic N=1-dot regression)")
    def _():
        g2, s2 = 8, 2048
        cache2 = append_kv(
            init_kv_cache(g2, s2, d),
            jax.random.normal(jax.random.PRNGKey(11), (g2, 1500, d)),
            jax.random.normal(jax.random.PRNGKey(12), (g2, 1500, d)),
        )
        q2 = jax.random.normal(jax.random.PRNGKey(13), (g2, r, d))
        b2 = jnp.asarray([1500, 1499, 1024, 1, 777, 1500, 100, 0], jnp.int32)
        a2 = (
            cache2.k_codes, cache2.k_scale[..., 0], cache2.v_codes,
            cache2.v_scale[..., 0], q2, b2,
            kcur, kcs[:, 0], vcur, vcs[:, 0],
        )
        out = decode_attend_q8kv_cur(*a2)
        ref = decode_attend_q8kv_cur_xla(*a2)
        md = float(jnp.max(jnp.abs(out - ref)))
        print(f"  maxdiff {md:.2e}", flush=True)
        assert md < 2e-3, md

    @check("ServeLoop == isolated generate (token-exact, real kernels)")
    def _():
        from micronet_tpu.models.llama import Llama, LlamaConfig, quantize_llama
        from micronet_tpu.serve import Request, ServeLoop

        cfg = LlamaConfig(
            vocab=256, dim=512, n_layers=2, n_heads=4, n_kv_heads=2,
            mlp_dim=1024, max_seq=2048, rope_theta=10000.0,
        )
        m = quantize_llama(Llama(cfg, rngs=nnx.Rngs(0)), group=128)

        def isolated(p, n):
            return [
                int(t)
                for t in np.asarray(
                    m.generate(jnp.asarray(p, jnp.int32), steps=n)
                )
            ]

        reqs = [
            Request(rid=0, prompt=[3, 14, 15, 9], max_new_tokens=8),
            Request(rid=1, prompt=[99, 26, 5], max_new_tokens=6),
            Request(rid=2, prompt=[7], max_new_tokens=7),
        ]
        loop = ServeLoop(m, max_slots=2)
        for rq in reqs:
            loop.submit(rq)
        done = loop.run()
        for rid, p, n in [(0, [3, 14, 15, 9], 8), (1, [99, 26, 5], 6), (2, [7], 7)]:
            assert done[rid].output == isolated(p, n), rid

    @check("decode_batch at max_seq=8192 vs per-request decode")
    def _():
        from micronet_tpu.models.llama import Llama, LlamaConfig, quantize_llama

        cfg = LlamaConfig(
            vocab=256, dim=512, n_layers=2, n_heads=4, n_kv_heads=2,
            mlp_dim=1024, max_seq=8192, rope_theta=500000.0,
        )
        m = quantize_llama(Llama(cfg, rngs=nnx.Rngs(0)), group=128)
        prompts = [[3, 14, 15, 9, 26], [99, 26, 5]]
        caches_b = m.init_cache_batch(2)
        offs, toks, refs = [], [], []
        for i, p in enumerate(prompts):
            t = jnp.asarray(p, jnp.int32)
            logits, ci = m.forward(t, m.init_cache(), jnp.int32(0))
            caches_b = jax.tree.map(
                lambda full, one: full.at[i].set(one), caches_b, ci
            )
            offs.append(len(p))
            tok = int(jnp.argmax(logits[-1]))
            toks.append(tok)
            li, _ = m.forward(
                jnp.asarray([tok], jnp.int32), ci, jnp.int32(len(p))
            )
            refs.append(np.asarray(li[0]))
        lb, _ = m.decode_batch(
            jnp.asarray(toks, jnp.int32)[:, None], caches_b,
            jnp.asarray(offs, jnp.int32),
        )
        for i in range(2):
            diff = float(np.abs(np.asarray(lb[i, 0]) - refs[i]).max())
            assert diff < 5e-2 and int(np.argmax(lb[i, 0])) == int(
                np.argmax(refs[i])
            ), (i, diff)

    @check("paged-attention kernel vs gather+dense oracle")
    def _():
        from micronet_tpu.ops.paged_attention import (
            paged_decode_attend,
            paged_decode_attend_xla,
        )
        from micronet_tpu.quant.paged_kv import init_paged_kv, paged_append

        h, page, slots, mp = 8, 128, 4, 4
        paged = init_paged_kv(1 + slots * mp, page, h, d, slots, mp)
        key = jax.random.PRNGKey(0)
        for si, n in enumerate([500, 300, 128, 7]):
            ks = jax.random.normal(jax.random.fold_in(key, si), (h, n, d))
            vs = jax.random.normal(jax.random.fold_in(key, 100 + si), (h, n, d))
            for t in range(n):
                paged = paged_append(paged, si, ks[:, t], vs[:, t])
        qp = jax.random.normal(jax.random.fold_in(key, 999), (slots, h, r, d))
        out = paged_decode_attend(
            paged.k_codes, paged.k_scale, paged.v_codes, paged.v_scale,
            paged.page_table, paged.lengths, qp,
        )
        ref = paged_decode_attend_xla(
            paged.k_codes, paged.k_scale, paged.v_codes, paged.v_scale,
            paged.page_table, paged.lengths, qp,
        )
        md = float(jnp.max(jnp.abs(out - ref)))
        print(f"  maxdiff {md:.2e}", flush=True)
        assert md < 2e-3, md

    @check("paged cur-kernel vs oracle (deferred-append serving path)")
    def _():
        from micronet_tpu.ops.paged_attention import (
            paged_decode_attend_cur,
            paged_decode_attend_cur_xla,
        )
        from micronet_tpu.quant.paged_kv import init_paged_kv, paged_append

        h, page, slots, mp = 8, 128, 4, 4
        paged = init_paged_kv(1 + slots * mp, page, h, d, slots, mp)
        key = jax.random.PRNGKey(21)
        for si, n in enumerate([500, 0, 128, 77]):
            ks = jax.random.normal(jax.random.fold_in(key, si), (h, max(n, 1), d))
            vs = jax.random.normal(jax.random.fold_in(key, 100 + si), (h, max(n, 1), d))
            for t in range(n):
                paged = paged_append(paged, si, ks[:, t], vs[:, t])
        qp = jax.random.normal(jax.random.fold_in(key, 999), (slots, h, r, d))
        cur = jax.random.normal(jax.random.fold_in(key, 998), (slots, h, d))
        kq, ks_ = quantize_kv_rows(cur)
        pargs = (
            paged.k_codes, paged.k_scale, paged.v_codes, paged.v_scale,
            paged.page_table, paged.lengths, qp,
            kq, ks_[..., 0], kq, ks_[..., 0],
        )
        out = paged_decode_attend_cur(*pargs)
        ref = paged_decode_attend_cur_xla(*pargs)
        md = float(jnp.max(jnp.abs(out - ref)))
        print(f"  maxdiff {md:.2e}", flush=True)
        assert md < 2e-3, md

    @check("PAGED ServeLoop == dense ServeLoop (real kernels, evictions)")
    def _():
        from micronet_tpu.models.llama import Llama, LlamaConfig, quantize_llama
        from micronet_tpu.serve import Request, ServeLoop

        cfg = LlamaConfig(
            vocab=256, dim=512, n_layers=2, n_heads=4, n_kv_heads=2,
            mlp_dim=1024, max_seq=2048, rope_theta=10000.0,
        )
        m = quantize_llama(Llama(cfg, rngs=nnx.Rngs(0)), group=128)

        def mk():
            return [
                Request(rid=0, prompt=[3, 14, 15, 9], max_new_tokens=8),
                Request(rid=1, prompt=[99, 26, 5], max_new_tokens=6),
                Request(rid=2, prompt=[7], max_new_tokens=7),
            ]

        dense = ServeLoop(m, max_slots=2)
        paged = ServeLoop(m, max_slots=2, paged=True, page_size=128,
                          num_pages=1 + 3 * 4)
        for loop in (dense, paged):
            for rq in mk():
                loop.submit(rq)
            loop.run()
        for rid in (0, 1, 2):
            assert paged.finished[rid].output == dense.finished[rid].output, (
                rid, paged.finished[rid].output, dense.finished[rid].output
            )
        top0 = 3 * 4
        for c in paged.caches:
            assert int(c.free_top) == top0, "pages leaked after evictions"

    print("[onchip] ALL CHECKS PASS", flush=True)


if __name__ == "__main__":
    main()
