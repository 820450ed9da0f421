"""pdf_to_text_ray — a Ray-Data-native main-content extraction engine.

Built from scratch (NOT a port) with the query/data-processing
capabilities of the reference repo Geetanjally/PDF_TO_TEXT
(surveyed in /root/repo/SURVEY.md). Every operator is expressed as a
``ray.data.Dataset`` transform: ``map_batches`` over zero-copy Arrow
batches for per-record work, actor pools for stateful stages (OCR
engines, model scorers), and a single ``groupby`` shuffle for the
dedup + per-document page reassembly.

The library never calls ``ray.init()`` — sessions are owned by the
caller (driver / bench.py / pytest fixture).
"""

__version__ = "0.1.0"
