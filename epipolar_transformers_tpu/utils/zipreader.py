"""Read images from inside .zip archives by `path.zip@/member` syntax.

Equivalent of reference utils/zipreader.py:23-46 (with the same handle
cache so archives open once per worker).
"""

from __future__ import annotations

import os
import zipfile

import numpy as np

# keyed by (pid, path): a fork()ed loader worker must NOT reuse the parent's
# handle — the inherited file descriptor shares its seek offset with the
# parent (and sibling workers), so concurrent reads interleave and zipfile
# raises BadZipFile ("Overlapped entries"). Each process opens its own.
_cache: dict[tuple[int, str], zipfile.ZipFile] = {}


def split_zip_path(path: str):
    pos = path.find(".zip@")
    assert pos != -1, f"character '.zip@' not found in {path!r}"
    return path[: pos + 4], path[pos + 5 :].lstrip("/")


def imread(path: str, flags=None) -> np.ndarray:
    """Decode an image stored inside a zip (BGR uint8, cv2 conventions)."""
    import cv2

    zip_path, member = split_zip_path(path)
    key = (os.getpid(), zip_path)
    if key not in _cache:
        _cache[key] = zipfile.ZipFile(zip_path, "r")
    data = _cache[key].read(member)
    buf = np.frombuffer(data, dtype=np.uint8)
    if flags is None:
        flags = cv2.IMREAD_COLOR | cv2.IMREAD_IGNORE_ORIENTATION
    return cv2.imdecode(buf, flags)


def close_all():
    for z in _cache.values():
        z.close()
    _cache.clear()
