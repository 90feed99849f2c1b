"""Site configuration (SURVEY §2.1 S8; reference cassandra_fs_pp/fs_pp.py:45-65).

TOML documents describing a firn station: identity (site/tz/lat/lon),
level-0 read options, level-1->2 correction metadata (UDG height-change
events, columns to drop, sensor-chain registries), and the level-0 dataset
registry (bales/onefile + per-dataset overrides).

Driver-side plain Python (stdlib tomllib): config is metadata, not data.
Unlike the reference ("If a key is missing, the first you will know ... is
when the workflow fails", README.md:50-52), required keys are validated up
front.
"""

from __future__ import annotations

import tomllib
from dataclasses import dataclass
from typing import Any

REQUIRED_TOP = ("site",)
REQUIRED_L01 = ("index_col",)


@dataclass
class SiteConfig:
    site: str
    raw: dict[str, Any]
    tz: str = "UTC"
    lat: float | None = None
    lon: float | None = None

    @property
    def level0_options(self) -> dict[str, Any]:
        return self.raw.get("level0_1", {})

    @property
    def level1_2(self) -> dict[str, Any]:
        return self.raw.get("level1_2", {})

    @property
    def udg_key(self) -> str:
        return self.level0_options.get("udg_key", "TCDT")

    @property
    def udg_height_changes(self) -> list[list]:
        return list(self.level1_2.get("udg_height_change", []))

    @property
    def remove_columns(self) -> list[str]:
        return list(self.level1_2.get("remove_columns", []))

    @property
    def tdr_info(self) -> dict[str, list]:
        return dict(self.level1_2.get("tdr_info", {}))

    @property
    def dtc_info(self) -> dict[str, list]:
        return dict(self.level1_2.get("dtc_info", {}))

    @property
    def ec_info(self) -> dict[str, list]:
        return dict(self.level1_2.get("ec_info", {}))

    @property
    def datasets(self) -> dict[str, dict[str, Any]]:
        """level-0 dataset registry, insertion-ordered (the LAST dataset
        gets the serviced-file append, per reference fs_pp.py:83-88)."""
        return dict(self.raw.get("level0", {}))


def load_config(path: str) -> SiteConfig:
    with open(path, "rb") as f:
        raw = tomllib.load(f)
    for key in REQUIRED_TOP:
        if key not in raw:
            raise KeyError(f"config {path}: missing required key {key!r}")
    l01 = raw.get("level0_1", {})
    for key in REQUIRED_L01:
        if key not in l01:
            raise KeyError(f"config {path}: missing level0_1.{key}")
    return SiteConfig(
        site=raw["site"],
        raw=raw,
        tz=raw.get("tz", "UTC"),
        lat=raw.get("lat"),
        lon=raw.get("lon"),
    )


# Engine copy of the validity spec (values from the reference's packaged
# cassandra_fs_pp/valid_data_ranges.toml, re-stated in FIXTURES.md §6).
DEFAULT_VALID_RANGES: dict[str, tuple[float, float]] = {
    "T107_C": (-50.0, 10.0),
    "TDR_EC": (0.0, 8.0),
    "TDR_T": (-50.0, 10.0),
    "TDR_VWC": (0.0, 1.0),
    "TDR_Perm": (1.0, 81.0),
    "EC": (0.5, 1.0),
}
