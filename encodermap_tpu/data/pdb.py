# encodermap_tpu/data/pdb.py
"""PDB file reading/writing (self-contained; mdtraj is unavailable here).

Coordinates follow the mdtraj convention used throughout the reference:
nanometers internally (PDB files store Angstrom; factor 10).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Union

import numpy as np

from .topology import Topology

__all__ = ["load_pdb", "write_pdb"]


def _guess_element(atom_name: str, element_field: str) -> str:
    if element_field:
        return element_field.strip().upper()
    name = atom_name.strip()
    # strip leading digits (e.g. 1HB2)
    stripped = name.lstrip("0123456789")
    if not stripped:
        return ""
    if stripped[:2].upper() in ("CL", "BR", "FE", "ZN", "MG", "NA", "SE", "MN"):
        return stripped[:2].upper()
    return stripped[0].upper()


def load_pdb(
    path: Union[str, Path], frame_stack: bool = True
) -> tuple[Topology, np.ndarray, Optional[np.ndarray]]:
    """Parse a PDB file.

    Returns:
        (topology, xyz, unitcell) where xyz is ``(n_frames, n_atoms, 3)`` in
        nm (MODEL records give multiple frames) and unitcell is
        ``(n_frames, 3)`` box lengths in nm or None.
    """
    top = Topology()
    frames: list[list[tuple[float, float, float]]] = []
    coords: list[tuple[float, float, float]] = []
    box = None

    chain_index = -1
    last_chain_id = None
    cur_res = None
    first_model_done = False

    with open(path) as fh:
        for line in fh:
            rec = line[:6]
            if rec == "CRYST1":
                try:
                    box = (
                        float(line[6:15]) / 10.0,
                        float(line[15:24]) / 10.0,
                        float(line[24:33]) / 10.0,
                    )
                    # "CRYST1 1.000 1.000 1.000" is the PDB convention
                    # for "no crystal" (NMR/modeled structures) — a real
                    # 0.1 nm box would wreck minimum-image distances
                    if max(box) <= 0.11:
                        box = None
                except ValueError:
                    box = None
            elif rec in ("ATOM  ", "HETATM"):
                altloc = line[16] if len(line) > 16 else " "
                if altloc not in (" ", "A", "1"):
                    continue  # keep only the primary alternate location
                x = float(line[30:38]) / 10.0
                y = float(line[38:46]) / 10.0
                z = float(line[46:54]) / 10.0
                coords.append((x, y, z))
                if first_model_done:
                    continue
                name = line[12:16].strip()
                res_name = line[17:21].strip()
                chain_id = line[21]
                res_seq = int(line[22:26])
                element_field = line[76:78] if len(line) >= 78 else ""
                if chain_id != last_chain_id:
                    chain_index += 1
                    last_chain_id = chain_id
                    cur_res = None
                if (
                    cur_res is None
                    or cur_res.resSeq != res_seq
                    or cur_res.name != res_name
                ):
                    cur_res = top.add_residue(res_name, res_seq, chain_index)
                top.add_atom(name, _guess_element(name, element_field), cur_res)
            elif rec == "TER   " or line.startswith("TER"):
                # chain break within the same chain id
                last_chain_id = None
            elif line.startswith("ENDMDL"):
                if coords:
                    frames.append(coords)
                    coords = []
                first_model_done = True

    if coords:
        frames.append(coords)

    n_atoms = top.n_atoms
    # some deposited ensembles have per-model extra atoms (waters/altlocs),
    # making `frames` ragged — trim every model to model 1's atoms BEFORE
    # stacking (np.asarray raises on ragged input under numpy 2.x)
    if any(len(f) != n_atoms for f in frames):
        frames = [f[:n_atoms] for f in frames]
        if any(len(f) != n_atoms for f in frames):
            raise ValueError(
                f"{path}: a MODEL has fewer atoms ({min(map(len, frames))}) "
                f"than model 1 ({n_atoms})"
            )
    xyz = np.asarray(frames, dtype=np.float32)
    unitcell = None
    if box is not None:
        unitcell = np.tile(np.asarray(box, np.float32), (len(xyz), 1))
    if not frame_stack and len(xyz) == 1:
        xyz = xyz[0]
    return top, xyz, unitcell


def write_pdb(
    path: Union[str, Path],
    top: Topology,
    xyz: np.ndarray,
    unitcell: Optional[np.ndarray] = None,
) -> None:
    """Write (multi-frame) coordinates as a PDB file (nm -> Angstrom)."""
    xyz = np.asarray(xyz)
    if xyz.ndim == 2:
        xyz = xyz[None]
    chain_ids = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    with open(path, "w") as fh:
        if unitcell is not None:
            a, b, c = (np.asarray(unitcell).reshape(-1, 3)[0] * 10.0).tolist()
            fh.write(
                f"CRYST1{a:9.3f}{b:9.3f}{c:9.3f}  90.00  90.00  90.00 P 1           1\n"
            )
        for f, frame in enumerate(xyz):
            fh.write(f"MODEL     {f + 1:4d}\n")
            serial = 1
            for atom in top.atoms:
                r = atom.residue
                x, y, z = (frame[atom.index] * 10.0).tolist()
                # clamp to the 4-char column like the residue name below —
                # a 5-char name (legal in GRO input) would shift every
                # later column and silently corrupt parsed coordinates
                name = atom.name[:4]
                name_fmt = f" {name:<3s}" if len(name) < 4 else f"{name:<4s}"
                chain = chain_ids[r.chain_index % len(chain_ids)]
                # fixed-column format: wrap overflowing serial/resSeq like
                # mdtraj (serial % 100000, resSeq % 10000) and clamp the
                # residue name — an overflow would shift every later
                # column and silently corrupt parsed coordinates
                fh.write(
                    f"ATOM  {serial % 100000:5d} {name_fmt} "
                    f"{r.name[:4]:<4s}{chain}{r.resSeq % 10000:4d}"
                    f"    {x:8.3f}{y:8.3f}{z:8.3f}  1.00  0.00"
                    f"          {atom.element:>2s}\n"
                )
                serial += 1
            fh.write("ENDMDL\n")
        fh.write("END\n")
