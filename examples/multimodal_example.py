"""Multimodal media pipeline over REAL PNGs and JPEGs
(Ray-Data-native): encode synthetic images with the from-scratch
codecs (extras/png.py, extras/jpeg.py), then run the decode →
resize → feature actor-pool stages over the mixed-format column."""

from __future__ import annotations

from examples._common import ensure_ray, finish_ray, print_table


def main() -> dict:
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from fuzzy_matching_ray.extras.multimodal import (
        decode_media,
        media_features,
        resize_media,
    )
    from fuzzy_matching_ray.extras.jpeg import encode_jpeg
    from fuzzy_matching_ray.extras.png import encode_png

    owned = ensure_ray()
    try:
        rng = np.random.default_rng(4)
        # mixed-format media column: PNGs (lossless noise) and JPEGs
        # (smooth gradients — what the DCT represents compactly)
        blobs = [
            encode_png(rng.integers(0, 256, (32 + i, 48 + i, 3)).astype(np.uint8))
            for i in range(4)
        ]
        yy, xx = np.mgrid[0:40, 0:56]
        grad = np.stack([(yy * 3) % 256, (xx * 2) % 256, ((yy + xx) * 2) % 256], axis=-1)
        blobs += [
            encode_jpeg(((grad + 17 * i) % 256).astype(np.uint8), quality=88, subsample="420")
            for i in range(4)
        ]
        media = rd.from_pandas(
            pd.DataFrame(
                {
                    "doc_id": np.arange(8, dtype=np.int64),
                    "media": blobs,
                    "media_type": ["image/png"] * 4 + ["image/jpeg"] * 4,
                }
            )
        )
        meta = decode_media(media, concurrency=2).to_pandas()
        small = resize_media(media, width=16, height=16, concurrency=2)
        feats = media_features(small, concurrency=2).to_pandas()
        print_table(meta.to_dict("records"), title="decoded metadata")
        print_table(feats.to_dict("records"), title="features after 16x16 resize")
        assert (feats["n_bytes"] == 16 * 16 * 3).all()
        return {"n_media": len(meta)}
    finally:
        finish_ray(owned)


if __name__ == "__main__":
    main()
