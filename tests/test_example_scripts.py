"""Guard: every `section.key=value` override in the example launch
scripts must be a real config key (catches recipe drift)."""

import glob
import os.path as osp
import re

import pytest

from avion_tpu.core.config import TrainConfig

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))

SCRIPTS = sorted(glob.glob(osp.join(ROOT, "scripts", "examples", "*.sh")))


@pytest.mark.parametrize("path", SCRIPTS, ids=[osp.basename(p)
                                               for p in SCRIPTS])
def test_example_script_overrides_are_valid(path):
    text = open(path).read()
    if "avion_tpu.train" not in text and "avion_tpu.eval" not in text:
        pytest.skip("no config-driven entry in this script")
    # tokens like section.key=value or key=value on python lines
    overrides = re.findall(r"(?:^|\s)([a-z_]+(?:\.[a-z_0-9]+)?)=(\S+)",
                           text, re.M)
    cfg = TrainConfig()
    for key, val in overrides:
        if key in ("set", "cd"):  # shell noise
            continue
        val = val.strip('"\\').replace("${OUTPUT_DIR:-", "").replace(
            "${PRETRAIN:-", "").replace("${CKPT:-", "").rstrip("}")
        try:
            cfg.apply_overrides([f"{key}={val}"])
        except ValueError as e:
            raise AssertionError(
                f"{osp.basename(path)}: invalid override {key!r}: {e}")
        except Exception:
            pass  # value-parse issues are fine; we check key validity


def test_all_example_scripts_exist():
    assert len(SCRIPTS) >= 7  # one per training/eval/serve family
