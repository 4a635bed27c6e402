"""Zip packaging sink (S12/S13, ``neo4j_export.py:1246-1276``).

Driver-side post-step after the CSV jobs land: zip all ``*.csv`` + the
model JSON with flattened arcnames, ZIP_DEFLATED. The timestamped
auto-name replicates ``{base}-export-{%Y-%m-%d-%H%M%S}.zip``
(``:1256-1260``); ``clock`` is injectable for deterministic tests (F7).
"""

from __future__ import annotations

import os
import shutil
import zipfile
from datetime import datetime


def create_zip(
    output_dir: str,
    zip_path: str | None = None,
    base_name: str | None = None,
    clock=None,
) -> str:
    if zip_path is None:
        now = (clock or datetime.now)()
        ts = now.strftime("%Y-%m-%d-%H%M%S")
        base = base_name or os.path.basename(os.path.normpath(output_dir))
        zip_path = os.path.join(os.path.dirname(os.path.normpath(output_dir)), f"{base}-export-{ts}.zip")

    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for entry in sorted(os.listdir(output_dir)):
            full = os.path.join(output_dir, entry)
            if os.path.isfile(full) and (
                entry.endswith(".csv") or entry == "neo4j_importer_model.json"
            ):
                zf.write(full, arcname=entry)
    return zip_path


def move_zip(auto_zip: str, target: str) -> str:
    """Custom zip rename (S13, ``neo4j_export.py:1466-1470``)."""
    shutil.move(auto_zip, target)
    return target
