"""Method registry: config.method.name -> method module (the 'one method
registry' of SURVEY §7 step 7)."""

from __future__ import annotations

from semi_supervised_semantic_segmentation_tpu.methods import (
    cps,
    fixmatch,
    mean_teacher,
    supervised,
)

_METHODS = {
    "supervised": supervised,
    "mean_teacher": mean_teacher,
    "fixmatch_cutmix": fixmatch,
    "cps": cps,
}


def get_method(name: str):
    try:
        return _METHODS[name]
    except KeyError:
        raise ValueError(f"unknown method '{name}'; have {sorted(_METHODS)}")
