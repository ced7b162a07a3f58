"""b_pdf_parser_ray — Ray-Data-native document extraction engine.

A brand-new engine (not a port) with the query/data-processing capabilities
of the reference ``rager306/b-pdf-parser`` (see SURVEY.md), built as
``ray.data.Dataset`` pipelines of ``map_batches`` over zero-copy Arrow
batches with actor pools for stateful stages.
"""

from . import fixtures, kernel, model  # noqa: F401
from .api import (  # noqa: F401
    DocumentParser,
    batch_parse,
    batch_parse_from_directory,
    load_config,
    parse,
    validate_batch_params,
)
