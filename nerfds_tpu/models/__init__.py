"""L3 model layer."""

from nerfds_tpu.models.embeddings import GLOEmbed  # noqa: F401
from nerfds_tpu.models.hyper import HyperSheetMLP, MaskMLP  # noqa: F401
from nerfds_tpu.models.mlp import MLP, NerfMLP  # noqa: F401
from nerfds_tpu.models.nerfds import NerfDSModel, default_extra_params  # noqa: F401
from nerfds_tpu.models.warp import SE3Field, TranslationField  # noqa: F401
