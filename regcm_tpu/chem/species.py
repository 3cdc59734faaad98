"""Tracer registry: chemsimtype → active species set.

The reference fixes the tracer table in ``mod_che_start.F90`` (chtrname
assignment per ``chemsimtype``) with indices in ``mod_che_indices.F90``.
This framework implements the aerosol *dust* simulations first:
``DUST`` (4 transport bins) and ``DU12`` (12 bins), the configurations
exercised by ``Testing/test_008.in``.  Gas-phase sets (CBMZ, POLLEN,
…) stay config-time refusals until their solvers are ported.

Scientific constant tables (bin edges, effective diameters,
solubility) are the reference's published dust parameters
(``Main/chemlib/mod_che_dust.F90:39-90``) — parameter similarity, not
code translation.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

# 4-bin transport size ranges (µm) — mod_che_dust.F90:47 dustbsiz1
DUSTBSIZ4 = np.array([[0.01, 1.00], [1.00, 2.50],
                      [2.50, 5.00], [5.00, 20.0]])
# 12-bin edges — mod_che_dust.F90:55 dustbsiz2
_E12 = [0.09, 0.18, 0.60, 1.55, 2.50, 3.75, 4.70, 5.70, 7.50, 14.5,
        25.0, 35.0, 50.0]
DUSTBSIZ12 = np.array([[_E12[i], _E12[i + 1]] for i in range(12)])
# bin effective diameters (µm) — mod_che_dust.F90:71,74
DUSTBED4 = np.array([0.658184, 1.75093, 3.67936, 8.46347])
DUSTBED12 = np.array([0.14062217, 0.43004150, 1.10404692, 1.96586770,
                      3.06595481, 4.18119746, 5.15961048, 6.54926438,
                      10.48942724, 18.92482164, 29.55897871,
                      41.62382698])
RHODUST = 2650.0          # kg/m³ (mod_che_dust.F90:90)
SOLDUST = 0.1             # solubility fraction (mod_che_dust.F90:84)


@dataclass
class ChemSpec:
    """Active tracer set + per-tracer aerosol parameters."""
    simtype: str
    names: List[str]
    # aerosol bin properties (None for gas tracers)
    bin_diam: np.ndarray          # effective diameter (µm) per tracer
    bin_size: np.ndarray          # (ntr, 2) transport size range (µm)
    rhop: np.ndarray              # particle density (kg/m³)
    sol: np.ndarray               # solubility fraction chtrsol

    @property
    def ntr(self) -> int:
        return len(self.names)


SUPPORTED_CHEMSIM = ("DUST", "DU12")


def build_species(chemsimtype: str) -> Optional[ChemSpec]:
    """Translate the chemparam ``chemsimtype`` string into a tracer set
    (mod_che_start.F90 start_chem).  Raises for simulations whose
    solvers are not yet ported — never a silent no-op."""
    sim = (chemsimtype or "").strip().upper()
    if not sim:
        return None
    if sim == "DUST":
        nbin = 4
        return ChemSpec(
            simtype=sim,
            names=[f"DUST{i+1:02d}" for i in range(nbin)],
            bin_diam=DUSTBED4, bin_size=DUSTBSIZ4,
            rhop=np.full(nbin, RHODUST), sol=np.full(nbin, SOLDUST))
    if sim == "DU12":
        nbin = 12
        return ChemSpec(
            simtype=sim,
            names=[f"DUST{i+1:02d}" for i in range(nbin)],
            bin_diam=DUSTBED12, bin_size=DUSTBSIZ12,
            rhop=np.full(nbin, RHODUST), sol=np.full(nbin, SOLDUST))
    raise ValueError(
        f"chemparam chemsimtype='{chemsimtype}' is not implemented in "
        f"regcm_tpu (supported: {SUPPORTED_CHEMSIM}; gas-phase CBMZ/"
        "CB6r2/ISORROPIA and SSLT/CARB/SULF aerosols are planned). "
        "Refusing to run with silently-disabled chemistry.")
