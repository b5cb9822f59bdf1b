"""ETL job configuration model.

Mirrors the reference's ``etl_config`` JSON schema
(``/root/reference/config.sample.json:14-55``, documented at
``README.md:89-141``): a shared section (buckets/roots) plus a list of
``job_specific`` entries (release, year, state, upgrades, metadata
version/root, optional counties) and operational ``settings``.

The storage root is a generic filesystem/object-store URI here —
``file:/...`` locally, ``s3a://bucket`` on a cluster — Spark's
Hadoop FS layer abstracts the difference, so the multiprocessing S3
plumbing of the reference has no equivalent to port.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any


@dataclass
class JobConfig:
    """One ``job_specific`` entry (config.sample.json:20-46)."""

    release_name: str
    release_year: str
    state: str
    upgrades: list[str]
    metadata_root_dir: str = ""
    relative_metadata_prefix_type: str = "1"
    counties: list[str] | None = None

    @property
    def job_name(self) -> str:
        # main.py:84-102 keys jobs by release/state for output + tracking
        return f"{self.release_name}_{self.release_year}_{self.state}"


@dataclass
class Settings:
    """Operational knobs (config.sample.json:47-54). Spark makes most
    of them obsolete (worker counts, queue bounds → task scheduler);
    kept for config-compat so reference configs parse unchanged."""

    log_dir: str = "logs"
    log_filename: str = "etl.log"
    logging_level: str = "INFO"
    idle_timeout_in_minutes: int = 5
    listing_page_size: int = 500
    max_listing_queue_size: int = 1000


@dataclass
class ETLConfig:
    src_bucket: str
    base_partition: str
    data_partition_in_release: str
    output_dir: str
    job_specific: list[JobConfig] = field(default_factory=list)
    settings: Settings = field(default_factory=Settings)
    glue_job_timeout: int = 14400

    @classmethod
    def from_dict(cls, raw: dict[str, Any]) -> "ETLConfig":
        jobs = [
            JobConfig(
                release_name=j["release_name"],
                release_year=j["release_year"],
                state=j["state"],
                upgrades=[str(u) for u in j["upgrades"]],
                metadata_root_dir=j.get("metadata_root_dir", ""),
                relative_metadata_prefix_type=str(
                    j.get("relative_metadata_prefix_type", "1")
                ),
                counties=j.get("counties"),
            )
            for j in raw.get("job_specific", [])
        ]
        settings_raw = {
            k: v
            for k, v in raw.get("settings", {}).items()
            if k in Settings.__dataclass_fields__
        }
        return cls(
            src_bucket=raw["src_bucket"],
            base_partition=raw["base_partition"],
            data_partition_in_release=raw["data_partition_in_release"],
            output_dir=raw.get("output_dir", "etl_output"),
            job_specific=jobs,
            settings=Settings(**settings_raw),
            glue_job_timeout=int(raw.get("glue_job_timeout", 14400)),
        )
