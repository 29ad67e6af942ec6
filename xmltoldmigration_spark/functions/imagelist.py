"""Image-list run-length encode/decode (C12/C13).

Reference: helpers/ImageListTranslation.java:26-172, pinned by
MigrationTest.testImageList:497-518.  Pure record-local string logic:
`…0001.tif|…0002.tif|…` <-> `…0001.tif:3` with missing-page ranges.
"""

from __future__ import annotations

import re

_IMAGE_P = re.compile(r"^(.+)(\d{4})( ?\..+)$")
_BASIC_P = re.compile(r"[^|]+")
_GENERAL_P = re.compile(r"([^|:]+):?(\d+)?")
_MISSING_P = re.compile(r"(\d+)-?(\d+)?")


def encode_image_list(src: str):
    """addImageList:26-111 -> (rle, total, missing_csv, warnings)."""
    prefix = ""
    suffix = ""
    i = -1
    total = 0
    first = True
    dst: list[str] = []
    first_ok = -1
    last_ok = -1
    missing: list[str] = []
    warnings: list[str] = []
    has_slash = False
    mixed_case = None
    not_sorted = None
    previous = None
    for bm in _BASIC_P.finditer(src):
        tok = bm.group(0)
        if "/" in tok:
            has_slash = True
        if not_sorted is None and previous is not None and previous > tok:
            not_sorted = previous + "|" + tok
        previous = tok
        total += 1
        m = _IMAGE_P.match(tok)
        if not m:
            warnings.append(f"cannot understand image string {tok}")
            if last_ok != -1:
                dst.append(":" + str(last_ok - first_ok + 1))
            if not first:
                dst.append("|")
            dst.append(tok)
            prefix, i, suffix = "", -1, ""
            last_ok = first_ok = -1
            first = False
            continue
        new_int = int(m.group(2))
        if first_ok == -1:
            first_ok = new_int
        if i != -1 and new_int > i + 1:
            rb, re_ = i + 1, new_int - 1
            missing.append(str(rb) if rb == re_ else f"{rb}-{re_}")
        new_suffix = m.group(3)
        if mixed_case is None and new_suffix != suffix and new_suffix.lower() == suffix.lower():
            mixed_case = suffix + " and " + new_suffix
        if m.group(1) != prefix or new_suffix != suffix or new_int != i + 1:
            if last_ok != -1:
                dst.append(":" + str(last_ok - first_ok + 1))
            if not first:
                dst.append("|")
            dst.append(m.group(0))
            prefix, i, suffix = m.group(1), new_int, new_suffix
            last_ok = -1
            first_ok = new_int
        else:
            i += 1
            last_ok = new_int
        first = False
    if last_ok != -1:
        dst.append(":" + str(last_ok - first_ok + 1))
    if has_slash:
        warnings.append("image list contains invalid character `/`")
    if mixed_case is not None:
        warnings.append("mix of upper and lower case extensions: " + mixed_case)
    if not_sorted is not None:
        warnings.append("image list is not sorted alphabetically: " + not_sorted)
    return "".join(dst), total, ",".join(missing), warnings


def get_image_nums(image_list: str, images_missing: str | None,
                   consider_missing: bool = True) -> dict[str, int]:
    """getImageNums:128-172 — inverse RLE expansion honoring missing ranges."""
    is_missing: set[int] = set()
    if consider_missing and images_missing:
        for m in _MISSING_P.finditer(images_missing):
            first = int(m.group(1))
            if m.group(2) is not None:
                is_missing.update(range(first, int(m.group(2)) + 1))
            else:
                is_missing.add(first)
    cur = 1
    res: dict[str, int] = {}
    for m in _GENERAL_P.finditer(image_list):
        while consider_missing and cur in is_missing:
            cur += 1
        if m.group(2) is not None and m.group(2) != "1":
            wm = re.match(r"^(.+)(\d{4})( ?\..+)$", m.group(1))
            if not wm:
                return res
            times = int(m.group(2))
            first_part = wm.group(1).lower()
            last_part = wm.group(3).lower()
            initial = int(wm.group(2))
            for k in range(times):
                res[first_part + "%04d" % (initial + k) + last_part] = cur
                cur += 1
        else:
            res[m.group(1).lower()] = cur
            cur += 1
    return res
