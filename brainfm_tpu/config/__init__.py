from .config import AttrDict, load_config, preprocess_cfg, to_namespace, update_out_dir

__all__ = ["AttrDict", "load_config", "preprocess_cfg", "to_namespace", "update_out_dir"]
