"""pdf_to_text_ray — a Ray-Data-native main-content extraction engine.

Built from scratch (NOT a port) with the query/data-processing
capabilities of the reference repo Geetanjally/PDF_TO_TEXT
(surveyed in /root/repo/SURVEY.md, operator coverage map in §8).
Every operator is a ``ray.data.Dataset`` transform: ``map_batches``
over zero-copy Arrow batches for per-record work, actor pools for
heavy stateful stages (OCR/media engines), task pools with per-worker
caches for cheap state, and explicit shuffles only where semantics
demand them — the default extraction path is map-only (broadcast
dedup), the checkpointed sink groups by a cluster-size-independent
partition key. See ARCHITECTURE.md for the 100 TB design story.

The library never calls ``ray.init()`` — sessions are owned by the
caller (driver / bench.py / pytest fixture).
"""

__version__ = "0.1.0"
