"""Byte-level final-output sinks (PDF / DOCX / PPTX / Markdown)."""

from .render import (  # noqa: F401
    export_all_outputs,
    render_docx_bytes,
    render_docx_from_markdown,
    render_outputs_batch,
    render_pdf_bytes,
    render_pptx_bytes,
    render_pptx_from_markdown,
)
