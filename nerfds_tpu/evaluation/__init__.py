"""L5 evaluation/render layer."""

from nerfds_tpu.evaluation import metrics  # noqa: F401
from nerfds_tpu.evaluation.render import (make_render_fn,  # noqa: F401
                                          render_image)
