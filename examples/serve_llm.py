"""LLM serving: W4 group-scaled weights + int8 KV cache, batched decode.

Run:  python examples/serve_llm.py

Composes the serving kit on the TinyDecoder demo model: convert the
float decoder to weight-only int4 (GPTQ-style group scales), keep the
KV cache in int8 with per-(head, position) scales, and run prefill +
batched greedy decode.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from flax import nnx

    from micronet_tpu.models.tiny_decoder import TinyDecoder, quantize_decoder
    from micronet_tpu.quant.kv_cache import kv_cache_bytes

    kw = dict(vocab=256, dim=128, heads=8, depth=4, mlp_dim=256, max_seq=64)
    float_model = TinyDecoder(**kw, rngs=nnx.Rngs(0))
    served = quantize_decoder(TinyDecoder(**kw, rngs=nnx.Rngs(0)), group=32)

    prompt = jnp.asarray([12, 99, 7, 45], jnp.int32)
    out_f = float_model.generate(prompt, steps=8)
    out_q = served.generate(prompt, steps=8)
    print("float  continuation:", list(np.asarray(out_f)))
    print("W4+KV8 continuation:", list(np.asarray(out_q)))

    lf, _ = float_model.forward(prompt, float_model.init_cache(), jnp.int32(0))
    lq, _ = served.forward(prompt, served.init_cache(), jnp.int32(0))
    cos = float(jnp.sum(lf * lq) / (jnp.linalg.norm(lf) * jnp.linalg.norm(lq)))
    print(f"logit cosine vs float: {cos:.4f}")

    # batched serving step (continuous-batching shape)
    toks = jnp.asarray([[1, 2, 3], [7, 8, 9]], jnp.int32)
    caches = served.init_cache_batch(2)
    logits, caches = jax.jit(served.forward_batch)(
        toks, caches, jnp.zeros((2,), jnp.int32)
    )
    print(f"batched prefill logits {logits.shape}; int8 KV bytes/layer/request "
          f"{kv_cache_bytes(served.init_cache()[0])}")

    # continuous batching: variable-length requests share 2 slots; a third
    # arrives mid-flight and takes the first slot that frees up. Each
    # request's tokens match its isolated generate() run exactly.
    from micronet_tpu.serve import Request, ServeLoop

    loop = ServeLoop(served, max_slots=2)
    loop.submit(Request(rid=0, prompt=[12, 99, 7, 45], max_new_tokens=8))
    loop.submit(Request(rid=1, prompt=[3, 5], max_new_tokens=4))
    loop.step()  # slot admission + first batched step
    loop.submit(Request(rid=2, prompt=[200, 17, 6], max_new_tokens=5))
    done = loop.run()
    for rid in sorted(done):
        r = done[rid]
        iso = list(np.asarray(served.generate(
            jnp.asarray(r.prompt, jnp.int32), steps=r.max_new_tokens)))
        tag = "== isolated" if r.output == [int(t) for t in iso] else "!= isolated"
        print(f"request {rid} (len {len(r.prompt)}): {r.output} {tag}")

    # PAGED serving (round 5): same loop over a shared page pool — HBM
    # scales with the sum of live lengths, pages return on eviction, and
    # a too-small pool defers admission instead of failing. Llama-family
    # models expose the paged decode path; prefill_chunk compiles ONE
    # prefill shape for all prompt lengths.
    from micronet_tpu.models.llama import Llama, llama_tiny
    from micronet_tpu.quant.paged_kv import paged_hbm_bytes

    lm = Llama(llama_tiny(max_seq=32), rngs=nnx.Rngs(0))
    paged = ServeLoop(lm, max_slots=4, paged=True, page_size=8,
                      num_pages=9, prefill_chunk=4)
    dense_ref = ServeLoop(lm, max_slots=4)
    for mk in (paged, dense_ref):
        mk.submit(Request(rid=0, prompt=[3, 14, 15], max_new_tokens=5))
        mk.submit(Request(rid=1, prompt=[9, 26, 5, 35, 8], max_new_tokens=4))
        mk.run()
    dense_bytes = sum(
        leaf.size * leaf.dtype.itemsize
        for leaf in jax.tree_util.tree_leaves(dense_ref.caches)
    )
    pool_bytes = sum(paged_hbm_bytes(c) for c in paged.caches)
    same = all(
        paged.finished[r].output == dense_ref.finished[r].output
        for r in (0, 1)
    )
    print(f"paged ServeLoop: tokens == dense: {same}; "
          f"KV HBM {pool_bytes}B (pool) vs {dense_bytes}B (dense slots)")


if __name__ == "__main__":
    main()
