"""Deployment / serving: OCR client, inference engine, HTTP app.

Port of the reference's ``deployment/`` layer (SURVEY.md L6): a ``POST
/core`` endpoint taking an image file and returning ``{"result": {field:
value}}``, backed by an external OCR HTTP service and the model's inference
path.
"""

from vibertgrid_tpu.serve.ocr_client import (  # noqa: F401
    ocr_extraction,
    parse_ocr_result,
)
from vibertgrid_tpu.serve.engine import InferenceEngine  # noqa: F401
from vibertgrid_tpu.serve.app import create_app, serve  # noqa: F401
