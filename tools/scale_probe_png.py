"""PNG codec throughput probe (round 6): is the stdlib PNG path in
`multimodal.png_encode/png_decode` fast enough to be a real pipeline
stage, and what does the all-five-filters encode policy cost vs
filter-0-only?

Measures images/s and decoded MB/s through the full catalog pipeline
shape (synth -> encode -> decode -> resize -> encode -> decode ->
features) on N images of HxW via the same mapInPandas kernels, plus a
driver-side microbenchmark isolating encode/decode filter cost.

Usage: python tools/scale_probe_png.py [n_images] [size]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from real_time_big_data_iot_monitoring_pipeline_spark.operators import multimodal
from real_time_big_data_iot_monitoring_pipeline_spark.session import get_session


def main() -> None:
    n_images = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_session(
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    ids = spark.range(n_images).select(F.col("id").alias("doc_id")).repartition(int(cpus))
    # warm the Python workers once
    multimodal.png_features(multimodal.synth_png(ids.limit(256), height=size, width=size)).count()

    t0 = time.time()
    img = multimodal.synth_png(ids, height=size, width=size)
    out = multimodal.png_features(multimodal.png_resize(img, size // 4, size // 4))
    n = out.count()
    dt = time.time() - t0
    mb = n_images * size * size / 1e6
    print(
        f"pipeline: {n} images {size}x{size} in {dt:.1f}s = "
        f"{n_images / dt:.0f} img/s, {mb / dt:.1f} decoded MB/s "
        f"(2 encodes + 2 decodes + resize per image, local[{cpus}])"
    )

    # round-8 addition: perceptual-hash stage on the PIXEL path — the
    # aHash kernel now decodes parseable PNGs and hashes the 8x8
    # nearest-resize, so the near-dup stage pays one decode per image.
    # The catalog's synth gradients all collapse to a handful of 8x8
    # hashes (they are phase shifts of ONE pattern — quadratic pair
    # blowup, measured 729k pairs over 5k images), so the probe builds
    # DIVERSE per-id noise images with n/2 PLANTED near-dups: ids
    # [n/2, n) re-encode id-n/2's pixels under a different filter
    # policy, so exactly n/2 pairs must verify at Hamming 0.
    import numpy as _np

    half = n_images // 2

    def _noise_png(batches):
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            payloads = []
            for d in ids:
                base = int(d) % half
                rng = _np.random.default_rng(base)
                px = rng.integers(0, 256, size=(size, size), dtype=_np.uint8)
                payloads.append(
                    multimodal.png_encode(px, policy="cycle" if int(d) < half else "fast")
                )
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    import pandas as pd

    noise = ids.mapInPandas(
        _noise_png, "doc_id long, payload binary"
    ).cache()
    noise.count()
    t0 = time.time()
    sig_n = multimodal.ahash_bands(noise).count()
    t_hash = time.time() - t0
    t0 = time.time()
    pairs_df = multimodal.phash_near_dups(noise)
    n_pairs = pairs_df.count()
    t_pairs = time.time() - t0
    planted = pairs_df.filter(
        (F.col("id_b") - F.col("id_a") == half) & (F.col("hamming") == 0)
    ).count()
    noise.unpersist()
    print(
        f"phash pixel path: {sig_n} signatures in {t_hash:.1f}s = "
        f"{sig_n / t_hash:.0f} img/s; banded near-dup join {t_pairs:.1f}s, "
        f"{n_pairs} pairs ({planted}/{half} planted re-encodes verified at Hamming 0)"
    )

    # driver-side filter-cost isolation (single core)
    from real_time_big_data_iot_monitoring_pipeline_spark.operators.multimodal import (
        _synth_pixels,
        png_decode,
        png_encode,
    )
    import numpy as np
    import zlib
    import struct

    px = _synth_pixels(7, 256, 256)
    t0 = time.time()
    for _ in range(20):
        payload = png_encode(px)
    t_enc = (time.time() - t0) / 20
    t0 = time.time()
    for _ in range(20):
        png_decode(payload)
    t_dec = (time.time() - t0) / 20

    # filter-0-only comparison payload (raw scanlines, no per-row filter
    # arithmetic on either side)
    raw = b"".join(b"\x00" + px[r].tobytes() for r in range(256))
    ihdr = struct.pack(">IIBBBBB", 256, 256, 8, 0, 0, 0, 0)
    flat = (
        multimodal._PNG_SIG
        + multimodal._png_chunk(b"IHDR", ihdr)
        + multimodal._png_chunk(b"IDAT", zlib.compress(raw, 6))
        + multimodal._png_chunk(b"IEND", b"")
    )
    t0 = time.time()
    for _ in range(20):
        png_decode(flat)
    t_dec0 = (time.time() - t0) / 20
    print(
        f"single-core 256x256: encode {t_enc * 1000:.1f}ms, decode "
        f"{t_dec * 1000:.1f}ms (all-filters payload) vs {t_dec0 * 1000:.1f}ms "
        f"(filter-0 payload); compressed {len(payload)} vs {len(flat)} bytes"
    )


if __name__ == "__main__":
    main()
