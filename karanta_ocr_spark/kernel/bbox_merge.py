"""Image bbox union-find merge — reference-faithful, including the
n>100 bail-out quirk.

Reference: ``karanta/prompts/anchor.py:131-198``. Overlapping (within
``tolerance=0.5``) image bboxes are merged via union-find into covering
boxes with ``+``-joined names. **Quirk preserved deliberately**: when
``n > 100`` the reference returns ``None`` (bare ``return`` at
``anchor.py:163-164``), which makes ``_linearize_pdf_report`` return
``""`` for the page (``anchor.py:238-241``) — goldens depend on it.
"""

from __future__ import annotations

from typing import List, Optional

from karanta_ocr_spark.kernel.pdf_mini import BoundingBox, ImageElement


def merge_image_elements(
    images: List[ImageElement], tolerance: float = 0.5
) -> Optional[List[ImageElement]]:
    n = len(images)
    if n > 100:
        # Reference bail-out (anchor.py:163-164): returns None, which
        # the linearizer treats as "no images" → empty page string.
        return None

    parent = list(range(n))

    def find(i: int) -> int:
        root = i
        while parent[root] != root:
            root = parent[root]
        while parent[i] != i:
            parent[i], i = root, parent[i]
        return root

    def union(i: int, j: int) -> None:
        ri, rj = find(i), find(j)
        if ri != rj:
            parent[ri] = rj

    def overlap(b1: BoundingBox, b2: BoundingBox) -> bool:
        h = max(0.0, max(b1.x0, b2.x0) - min(b1.x1, b2.x1))
        v = max(0.0, max(b1.y0, b2.y0) - min(b1.y1, b2.y1))
        return h <= tolerance and v <= tolerance

    for i in range(n):
        for j in range(i + 1, n):
            if overlap(images[i].bbox, images[j].bbox):
                union(i, j)

    groups: dict[int, list[int]] = {}
    for i in range(n):
        groups.setdefault(find(i), []).append(i)

    merged: list[ImageElement] = []
    for indices in groups.values():
        bbox = images[indices[0]].bbox
        name = images[indices[0]].name
        for idx in indices[1:]:
            b = images[idx].bbox
            bbox = BoundingBox(
                min(bbox.x0, b.x0), min(bbox.y0, b.y0),
                max(bbox.x1, b.x1), max(bbox.y1, b.y1),
            )
            name += f"+{images[idx].name}"
        merged.append(ImageElement(name=name, bbox=bbox))
    return merged
