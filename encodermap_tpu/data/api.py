# encodermap_tpu/data/api.py
"""The ``em.load()``-style entry point
(reference: ``/root/reference/encodermap/__init__.py:365-532``)."""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Sequence, Union

from .trajectory import SingleTraj, TrajEnsemble

__all__ = ["load"]


def load(
    trajs: Union[str, Path, Sequence],
    tops: Optional[Union[str, Path, Sequence]] = None,
    common_str: Optional[Sequence[str]] = None,
    index: Optional[object] = None,
    traj_num: Optional[int] = None,
) -> Union[SingleTraj, TrajEnsemble]:
    """Load MD data lazily.

    A single file path returns a :class:`SingleTraj`; a sequence returns a
    :class:`TrajEnsemble`. No coordinate IO happens until frames are touched.
    """
    if isinstance(trajs, (str, Path)):
        top = tops
        if isinstance(tops, (list, tuple)):
            top = tops[0]
        return SingleTraj(trajs, top, index=index, traj_num=traj_num)
    if isinstance(tops, (str, Path)):
        tops = [tops]
    return TrajEnsemble(list(trajs), tops, common_str=common_str)
