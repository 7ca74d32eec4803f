"""Engine configuration.

Mirrors the reference's `config.ini` contract
(/root/reference/config.ini.template:1-10 — [aws] s3 credentials +
[datalake] bronze/silver/gold bucket names) loaded with configparser
(/root/reference/data_lake_transformer.py:209-214), and maps the DuckDB
`SET s3_*` calls (data_lake_transformer.py:227-237) onto the equivalent
Hadoop S3A configuration keys.

Environment-variable fallbacks allow credential-less local runs (tests
use plain file paths, no S3 at all).
"""

from __future__ import annotations

import configparser
import os
from dataclasses import dataclass, field


@dataclass
class EngineConfig:
    bronze_bucket: str = "bronze"
    silver_bucket: str = "silver"
    gold_bucket: str = "gold"
    s3_access_key_id: str | None = None
    s3_secret_access_key: str | None = None
    s3_endpoint: str | None = None
    s3_region_name: str | None = None
    # scheme for generated lake paths: "s3a://" in prod, "file://"
    # or a plain local dir in tests
    scheme: str = "s3a://"
    extra: dict[str, str] = field(default_factory=dict)

    @classmethod
    def from_ini(cls, path: str) -> "EngineConfig":
        cp = configparser.ConfigParser()
        cp.read(path)
        get = lambda sec, opt: cp.get(sec, opt, fallback=None)  # noqa: E731
        return cls(
            bronze_bucket=get("datalake", "bronze_bucket") or "bronze",
            silver_bucket=get("datalake", "silver_bucket") or "silver",
            gold_bucket=get("datalake", "gold_bucket") or "gold",
            s3_access_key_id=get("aws", "s3_access_key_id"),
            s3_secret_access_key=get("aws", "s3_secret_access_key"),
            s3_endpoint=get("aws", "s3_endpoint"),
            s3_region_name=get("aws", "s3_region_name"),
        )

    @classmethod
    def from_env(cls) -> "EngineConfig":
        env = os.environ
        return cls(
            bronze_bucket=env.get("LAKE_BRONZE_BUCKET", "bronze"),
            silver_bucket=env.get("LAKE_SILVER_BUCKET", "silver"),
            gold_bucket=env.get("LAKE_GOLD_BUCKET", "gold"),
            s3_access_key_id=env.get("AWS_ACCESS_KEY_ID"),
            s3_secret_access_key=env.get("AWS_SECRET_ACCESS_KEY"),
            s3_endpoint=env.get("S3_ENDPOINT"),
            s3_region_name=env.get("AWS_REGION"),
        )

    def spark_s3a_conf(self) -> dict[str, str]:
        """DuckDB `SET s3_*` -> Hadoop S3A equivalents."""
        conf: dict[str, str] = {}
        if self.s3_access_key_id:
            conf["spark.hadoop.fs.s3a.access.key"] = self.s3_access_key_id
        if self.s3_secret_access_key:
            conf["spark.hadoop.fs.s3a.secret.key"] = self.s3_secret_access_key
        if self.s3_endpoint:
            conf["spark.hadoop.fs.s3a.endpoint"] = self.s3_endpoint
        conf.update(self.extra)
        return conf

    def zone_url(self, zone: str) -> str:
        bucket = {
            "bronze": self.bronze_bucket,
            "silver": self.silver_bucket,
            "gold": self.gold_bucket,
        }[zone]
        scheme = self.scheme
        if scheme in ("", None) or bucket.startswith("/"):
            return bucket
        return f"{scheme}{bucket}"
