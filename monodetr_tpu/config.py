"""YAML config loading.

Same schema as the reference (`configs/monodetr.yaml`): one dict with
`dataset` / `model` / `optimizer` / `lr_scheduler` / `trainer` / `tester`
sections plus `random_seed` / `model_name`, passed down as plain dicts with
defaults resolved at use sites (tools/train_val.py:34).
"""

import yaml


def load_config(path: str) -> dict:
    with open(path) as f:
        return yaml.safe_load(f)
