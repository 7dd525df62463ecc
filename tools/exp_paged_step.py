"""On-chip: where does the paged decode chunk's time go?

Times PagedBatchEngine._dispatch_decode + _process_emitted cycles at B=8
after admission, under (a) the Pallas paged kernel and (b) the XLA gather
reference path (UZU_TPU_KERNELS=xla), plus a host-only pass (no dispatch)
to isolate scheduler overhead.
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import bench
    from uzu_tpu import LanguageModel
    from uzu_tpu.engine.paged_batch import PagedBatchEngine

    mode = os.environ.get("UZU_TPU_KERNELS", "auto")
    kv_quant = bool(os.environ.get("UZU_EXP_KVQUANT"))
    # long-context knobs (VERDICT r2 #6: settle INT8 pools at B*C where KV
    # reads rival weight bytes — C in {4k, 8k})
    ctx = int(os.environ.get("UZU_EXP_CTX", 1024))
    plen = int(os.environ.get("UZU_EXP_PREFILL", 32))
    page = int(os.environ.get("UZU_EXP_PAGE", 64))
    pages = int(os.environ.get("UZU_EXP_PAGES",
                               max(256, 8 * (ctx // page) + 16)))
    model_dir, _ = bench.flagship_dir(True)
    lm = LanguageModel.from_dir(model_dir, max_context=ctx,
                                prefill_buckets=(32, 512), kv_quant=kv_quant)
    rng = np.random.default_rng(0)
    eng = PagedBatchEngine(lm, batch_size=8, decode_chunk=16, num_pages=pages,
                           page_size=page, stop_token_ids=[])
    reqs = [eng.submit(rng.integers(0, lm.decoder_config.vocab_size, plen), 10_000)
            for _ in range(8)]
    # admit all + warm the decode executable
    for _ in range(12):
        eng.step()
    t0 = time.perf_counter()
    n = 12
    for _ in range(n):
        eng.step()
    dt = (time.perf_counter() - t0) / n
    toks = 16 * 8
    print(f"mode={mode} kv_quant={kv_quant} ctx={ctx} plen={plen} "
          f"page={page}: {dt*1e3:.1f} ms per 16-step chunk "
          f"({toks/dt:.0f} tok/s aggregate, {dt/16*1e3:.2f} ms/step)")

    # host-side scheduler cost alone (tables + keys + ensure, no dispatch);
    # clamp to max_context — ensure() past it would need a 65th table row
    # at ctx=4096/page=64 and crash the probe after the measurement
    t0 = time.perf_counter()
    for _ in range(50):
        eng._tables()
        for i, slot in enumerate(eng.slots):
            if not slot.free:
                eng.pool.ensure(i, min(slot.pos + 33, lm.max_context))
    print(f"host-side per chunk: {(time.perf_counter()-t0)/50*1e3:.2f} ms")


if __name__ == "__main__":
    main()
