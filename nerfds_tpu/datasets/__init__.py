"""L2 data layer."""

from nerfds_tpu.datasets.core import (DataSource, HostRayIterator,  # noqa: F401
                                      RayStore, sample_batch)
from nerfds_tpu.datasets.interp import InterpDataSource  # noqa: F401
from nerfds_tpu.datasets.nerfies import NerfiesDataSource  # noqa: F401
from nerfds_tpu.datasets.synthetic import (SyntheticDataSource,  # noqa: F401
                                           write_nerfies_dataset)


def from_config(experiment_config):
  """Instantiates the datasource named by an ExperimentConfig."""
  cfg = experiment_config
  if cfg.datasource_type == 'nerfies':
    return NerfiesDataSource(cfg.data_dir, image_scale=cfg.image_scale,
                             random_seed=cfg.random_seed)
  if cfg.datasource_type == 'interp':
    return InterpDataSource(cfg.data_dir, interval=cfg.interp_interval,
                            image_scale=cfg.image_scale,
                            random_seed=cfg.random_seed)
  if cfg.datasource_type == 'synthetic':
    return SyntheticDataSource(num_frames=cfg.synthetic_frames,
                               image_size=cfg.synthetic_image_size,
                               random_seed=cfg.random_seed)
  raise ValueError(f'Unknown datasource type {cfg.datasource_type!r}')
