"""Byte-size-aware block capping (B2): tame skewed html/text rows.

The synthetic corpus (like real Common Crawl) has a long tail of pages
100-300x the median size.  Downstream ``map_batches`` slice by ROW
count, so one multi-MB document next to small ones inflates a whole
model batch.  Two complementary controls:

* this stage: a generator ``map_batches`` fn that re-yields each Arrow
  batch in slices whose payload-column byte sum is capped, so no single
  block/batch carries more than ``max_bytes`` of payload;
* in-actor micro-batching by estimated word count inside the NER stage
  (stages/ner.py), which bounds padding waste per model call.

``DataContext.target_max_block_size`` remains the global backstop.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def make_byte_capped_rebatcher(max_bytes: int = 4 * 1024 * 1024, column: str = "text"):
    def rebatch(batch: pa.Table):
        sizes = pc.binary_length(batch.column(column)).to_numpy(zero_copy_only=False)
        if sizes.sum() <= max_bytes:
            yield batch
            return
        # greedy contiguous packing: split whenever the running sum would
        # exceed the cap (oversized single rows become singleton blocks)
        cuts = [0]
        run = 0
        for i, s in enumerate(sizes):
            if run and run + s > max_bytes:
                cuts.append(i)
                run = 0
            run += int(s)
        cuts.append(len(sizes))
        for lo, hi in zip(cuts, cuts[1:]):
            if hi > lo:
                yield batch.slice(lo, hi - lo)

    return rebatch
