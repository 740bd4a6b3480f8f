"""Landing-zone ingestion (SURVEY §2.2 K5).

The reference uploads raw API JSON to
``gs://<bucket>/00_landing_zone/{y}/{m}/{d}/`` driver-side
(``gcp_utils/common_functions.py:57-73``, ``main.py:46-49``). The
engine equivalent writes the same date-partitioned layout on any
filesystem; Spark later scans it with partition pruning instead of
path arithmetic. Pure file I/O — no Spark involvement, by design
(one small file per day; the cluster starts at the scan).
"""

from __future__ import annotations

import datetime as dt
import json
import os
import shutil


def landing_path(root: str, day: dt.date, filename: str) -> str:
    return os.path.join(
        root, f"{day.year}", f"{day.month:02d}", f"{day.day:02d}", filename
    )


def upload_file_to_landing(
    src_file: str, root: str, day: dt.date, filename: str | None = None
) -> str:
    """Copy a fetched raw file into the date-partitioned landing zone."""
    dest = landing_path(root, day, filename or os.path.basename(src_file))
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    shutil.copyfile(src_file, dest)
    return dest


def write_doc_to_landing(
    doc: dict, root: str, day: dt.date, filename: str
) -> str:
    """Serialize an API response dict straight into the landing zone
    (the reference's local-file intermediate hop removed)."""
    dest = landing_path(root, day, filename)
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    with open(dest, "w") as f:
        json.dump(doc, f)
    return dest
