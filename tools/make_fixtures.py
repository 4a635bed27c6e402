#!/usr/bin/env python
"""Regenerate committed fixture tables.

``fake_media.parquet`` is the seeded fake-media table used by the
``multimodal_features`` gate query: the payload bytes are committed (not
regenerated at query time) so the DuckDB oracle can compute the same
byte statistics over the very same blobs. Regenerate with:

    python tools/make_fixtures.py
"""

from __future__ import annotations

import os
import random

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(
    REPO, "neo4j_database_to_data_importer_package_spark", "fixtures", "fake_media.parquet"
)


def fake_media_rows(n: int = 64, seed: int = 42):
    """Same generation as operators.multimodal.make_fake_media."""
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        size = 256 + (i % 7) * 128
        payload = bytes(rng.randrange(256) for _ in range(size))
        rows.append(
            {
                "media_id": i,
                "payload": payload,
                "meta": {
                    "media_type": ["image", "audio", "video"][i % 3],
                    "format": ["png", "wav", "mp4"][i % 3],
                    "width": 64,
                    "height": 64,
                    "duration_ms": 3000 + 500 * (i % 5),
                },
            }
        )
    return rows


def main() -> None:
    rows = fake_media_rows()
    schema = pa.schema(
        [
            pa.field("media_id", pa.int64(), nullable=False),
            pa.field("payload", pa.binary()),
            pa.field(
                "meta",
                pa.struct(
                    [
                        pa.field("media_type", pa.string()),
                        pa.field("format", pa.string()),
                        pa.field("width", pa.int32()),
                        pa.field("height", pa.int32()),
                        pa.field("duration_ms", pa.int64()),
                    ]
                ),
            ),
        ]
    )
    table = pa.Table.from_pylist(rows, schema=schema)
    pq.write_table(table, OUT)
    print(f"wrote {OUT} ({os.path.getsize(OUT)} bytes, {table.num_rows} rows)")


if __name__ == "__main__":
    main()
