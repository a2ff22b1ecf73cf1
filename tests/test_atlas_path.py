"""Atlas-path resolution (VERDICT r4 weak #6): the deformed-atlas source
must be a config key, not a hard-coded reference path — override order
explicit arg > cfg.atlas_path > $BRAINFM_ATLAS_PATH > reference fixture.
Reference: utils/test_utils.py:37 hard-codes 'files/gca.mgz'."""

import os

from brainfm_tpu.config import AttrDict, load_config
from brainfm_tpu.infer.api import DEFAULT_ATLAS_PATH, default_atlas_path

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_resolution_order(monkeypatch):
    monkeypatch.delenv("BRAINFM_ATLAS_PATH", raising=False)
    assert default_atlas_path() == DEFAULT_ATLAS_PATH
    cfg = AttrDict.from_nested({"atlas_path": "/tmp/cfg.mgz"})
    assert default_atlas_path(cfg) == "/tmp/cfg.mgz"
    monkeypatch.setenv("BRAINFM_ATLAS_PATH", "/tmp/env.mgz")
    assert default_atlas_path() == "/tmp/env.mgz"
    # the config key wins over the env var
    assert default_atlas_path(cfg) == "/tmp/cfg.mgz"
    # a cfg without the key falls through to the env var
    assert default_atlas_path(AttrDict.from_nested({})) == "/tmp/env.mgz"


def test_default_val_yaml_carries_key(monkeypatch):
    monkeypatch.delenv("BRAINFM_ATLAS_PATH", raising=False)
    cfg = load_config([os.path.join(REPO, "cfgs/trainer/default_val.yaml")])
    assert default_atlas_path(cfg) == DEFAULT_ATLAS_PATH
