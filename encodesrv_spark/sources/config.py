"""Engine configuration source (S4).

The reference loads a nested config.json once into a global dict
(/root/reference/encodesrv/config.py:5-6, config.json.sample:1-31).
Here the same document shape becomes a typed, validated dataclass —
no globals, injectable in tests.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any


@dataclass(frozen=True)
class DbConfig:
    host: str = "localhost"
    port: int = 5432
    database: str = "encodesrv"
    user: str = ""
    password: str = ""


@dataclass(frozen=True)
class EngineConfig:
    """Mirror of the reference's config.json shape (threads, tmpfolder,
    mntfolder, servername + connection blocks)."""

    servername: str = "Encode Server"
    threads: int = 4
    tmpfolder: str = "/tmp"
    mntfolder: str = "/mnt/"
    db: DbConfig = field(default_factory=DbConfig)
    extras: dict[str, Any] = field(default_factory=dict)

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "EngineConfig":
        known = {"servername", "threads", "tmpfolder", "mntfolder", "db"}
        db = DbConfig(**d.get("db", {})) if isinstance(d.get("db"), dict) else DbConfig()
        return cls(
            servername=d.get("servername", cls.servername),
            threads=int(d.get("threads", cls.threads)),
            tmpfolder=d.get("tmpfolder", cls.tmpfolder),
            mntfolder=d.get("mntfolder", cls.mntfolder),
            db=db,
            extras={k: v for k, v in d.items() if k not in known},
        )

    @classmethod
    def load(cls, path: str) -> "EngineConfig":
        with open(path) as f:
            return cls.from_dict(json.load(f))
