"""Multimodal pipeline tour — binary columns through REAL stdlib
codecs (no third-party media libraries), Arrow-batched mapInPandas
end to end.

    python examples/multimodal_pipeline.py [sf_dir]

1. synthesize — documents become genuine WAV / grayscale-8 PNG / Y4M
                payloads (the bytes ARE the text, so every decode is
                SQL-replayable — how the oracle hash-checks codecs).
2. decode     — container walks: RIFF/WAVE header+frames, PNG chunk
                walk + inflate + de-filter, Y4M stream header +
                FRAME markers.
3. detect     — per-frame features and their consumers: audio RMS →
                silence segments; video mean luma → shot boundaries.
4. transform  — decode → nearest-neighbor resize → re-encode → decode
                round trip (the thumbnail path).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cse_datapipeline_and_mls_spark.queries import QUERIES  # noqa: E402
from cse_datapipeline_and_mls_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("multimodal-tour")

    print("== audio: WAV decode stats (header-pinned duration) ==")
    QUERIES["x_multimodal_wav_decode"](spark, sf_dir).show(5)

    print("== image: PNG decode stats (IHDR + full inflate) ==")
    QUERIES["x_multimodal_png_decode"](spark, sf_dir).show(5)

    print("== video: Y4M decode stats (stream header + FRAME walk) ==")
    QUERIES["x_multimodal_video_decode"](spark, sf_dir).show(5)

    print("== video frames -> shot boundaries (|delta mean luma| > 16) ==")
    QUERIES["x_multimodal_shot_boundaries"](spark, sf_dir).orderBy(
        F.desc("n_cuts")
    ).show(5)

    print("== audio frames -> silence segments (RMS < 100) ==")
    QUERIES["x_multimodal_silence_segments"](spark, sf_dir).orderBy(
        F.desc("longest_quiet")
    ).show(5)

    print("== image resize round trip (decode -> resample -> re-encode) ==")
    QUERIES["x_multimodal_png_resize"](spark, sf_dir).show(5)


if __name__ == "__main__":
    main()
