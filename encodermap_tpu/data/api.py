# encodermap_tpu/data/api.py
"""The ``em.load()``-style entry point
(reference: ``/root/reference/encodermap/__init__.py:365-532``)."""

from __future__ import annotations

from pathlib import Path
from typing import Callable, Optional, Sequence, Union

from .trajectory import SingleTraj, TrajEnsemble

__all__ = ["load"]


def load(
    trajs: Union[str, Path, Sequence],
    tops: Optional[Union[str, Path, Sequence]] = None,
    common_str: Optional[Union[str, Sequence[str]]] = None,
    backend: str = "no_load",
    index: Optional[object] = None,
    traj_num: Optional[int] = None,
    basename_fn: Optional[Callable[[str], str]] = None,
    custom_top: Optional[dict] = None,
) -> Union[SingleTraj, TrajEnsemble]:
    """Load MD data lazily.

    A single file path returns a :class:`SingleTraj`; a sequence returns a
    :class:`TrajEnsemble`. No coordinate IO happens until frames are
    touched (``backend`` is accepted for reference compatibility; the only
    backend here is the lazy native one). ``basename_fn`` maps a file path
    to the display/matching basename; ``custom_top`` is a
    ``CustomAAsDict`` of unnatural residue definitions applied to every
    loaded trajectory (reference ``__init__.py:365-532``).
    """
    if backend not in ("no_load", "mdtraj"):
        raise ValueError(f"unknown backend {backend!r}")
    if isinstance(common_str, str):
        common_str = [common_str]
    if isinstance(trajs, (str, Path)):
        top = tops
        if isinstance(tops, (list, tuple)):
            top = tops[0]
        out: Union[SingleTraj, TrajEnsemble] = SingleTraj(
            trajs, top, index=index, traj_num=traj_num,
            basename_fn=basename_fn,
        )
    else:
        if isinstance(tops, (str, Path)):
            tops = [tops]
        out = TrajEnsemble(
            list(trajs), tops, common_str=common_str,
            basename_fn=basename_fn,
        )
    if custom_top is not None:
        out.load_custom_topology(custom_top)
    return out
