"""S3/AWS credentialization for executor-side readers (SURVEY §2.1 S11;
reference behavior: odc/stac/loader/_aws.py:76-202).

Spark-first shape: the driver resolves region + credentials ONCE
(`get_aws_settings`), the resulting plain dict ships to executors with
the task closure / a broadcast variable, and each Python worker process
restores it into the module-level reader environment
(`sources.synth.restore_env`) on first use — the executor-process analog
of the reference's thread-local GDAL/AWS session reuse
(loader/_rio.py:126-176). STS credentials can expire mid-job, so the
frozen credentials AND the botocore credential object are both returned;
long jobs re-freeze per task batch (reference notes the same caveat,
loader/_rio.py:275-280).

Resolution chains (reference semantics, independent implementation):

- region: explicit arg → AWS_REGION / AWS_DEFAULT_REGION env →
  botocore session config → EC2 instance metadata (optional, guarded,
  short timeout) → supplied default → error
  (auto_find_region, _aws.py:76-98)
- unsigned: explicit arg → AWS_UNSIGNED / AWS_NO_SIGN_REQUEST env
  truthy strings (_aws.py:147-156)
- credentials: botocore session with exponential-backoff retry
  (get_creds_with_retry, _aws.py:101-117)
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, Optional, Tuple

try:
    import botocore.session

    HAVE_BOTOCORE = True
except ImportError:  # pragma: no cover - botocore is present in this env
    HAVE_BOTOCORE = False

_TRUTHY = ("YES", "Y", "TRUE", "T", "1")


def _env_region() -> Optional[str]:
    for var in ("AWS_REGION", "AWS_DEFAULT_REGION"):
        v = os.environ.get(var)
        if v:
            return v
    return None


def ec2_current_region(timeout: float = 0.25) -> Optional[str]:
    """Region of the EC2 instance this runs on, or None (not EC2 / no
    metadata service). Guarded + short timeout: on a Spark executor that
    is NOT on EC2 this must fail fast, not hang task startup."""
    try:  # pragma: no cover - no metadata service in this container
        import urllib.request

        req = urllib.request.Request(
            "http://169.254.169.254/latest/meta-data/placement/region"
        )
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            return resp.read().decode("utf-8").strip() or None
    except Exception:
        return None


def auto_find_region(session=None, default: Optional[str] = None) -> str:
    """env → botocore session config → EC2 metadata → default → error."""
    region = _env_region()
    if region is None and session is not None:
        region = session.get_config_variable("region")
    if region is None:
        region = ec2_current_region()
    if region is not None:
        return region
    if default is None:
        raise ValueError("cannot determine AWS region and no default supplied")
    return default


def aws_unsigned_from_env() -> bool:
    for var in ("AWS_UNSIGNED", "AWS_NO_SIGN_REQUEST"):
        v = os.environ.get(var)
        if v is not None:
            return v.upper() in _TRUTHY
    return False


def get_creds_with_retry(session, max_tries: int = 10, sleep: float = 0.1):
    """Credentials with exponential backoff (STS/IMDS can be flaky on
    cold start); None after max_tries."""
    delay = sleep
    for attempt in range(max_tries):
        if attempt > 0:
            time.sleep(delay)
            delay = min(delay * 2, 10.0)
        creds = session.get_credentials()
        if creds is not None:
            return creds
    return None


def mk_boto_session(profile: Optional[str] = None, region_name: Optional[str] = None):
    if not HAVE_BOTOCORE:  # pragma: no cover
        raise NotImplementedError("botocore is required for AWS credentialization")
    session = botocore.session.Session(profile=profile)
    if session.get_config_variable("region") is None:
        resolved = (
            auto_find_region(session, default="us-west-2")
            if region_name in (None, "auto")
            else region_name
        )
        session.set_config_variable("region", resolved)
    return session


def get_aws_settings(
    profile: Optional[str] = None,
    region_name: str = "auto",
    aws_unsigned: Optional[bool] = None,
    requester_pays: bool = False,
) -> Tuple[Dict[str, Any], Optional[object]]:
    """Driver-side resolution → (plain settings dict for shipping to
    executors, live botocore credentials for refresh). Unsigned mode
    returns no credentials at all."""
    session = mk_boto_session(profile=profile, region_name=region_name)
    region = session.get_config_variable("region")
    if aws_unsigned is None:
        aws_unsigned = aws_unsigned_from_env()
    if aws_unsigned:
        return {"region_name": region, "aws_unsigned": True}, None
    creds = get_creds_with_retry(session)
    if creds is None:
        raise ValueError("could not obtain AWS credentials")
    frozen = creds.get_frozen_credentials()
    return (
        {
            "region_name": region,
            "aws_access_key_id": frozen.access_key,
            "aws_secret_access_key": frozen.secret_key,
            "aws_session_token": frozen.token,
            "requester_pays": requester_pays,
        },
        creds,
    )


def configure_rio(**env) -> dict:
    """Public API parity with the reference's ``configure_rio``
    (odc/stac/__init__.py:20-36; _rio.py GDAL env management): install
    reader-environment key/values (GDAL-style options, cloud defaults)
    into the executor-side env singleton. With no rasterio in this
    container the values are held and shipped verbatim; the RioReader
    slot consumes them when present."""
    from .synth import _ENV

    _ENV.setdefault("rio", {}).update(env)
    return dict(_ENV["rio"])


def configure_s3_access(
    profile: Optional[str] = None,
    region_name: str = "auto",
    aws_unsigned: Optional[bool] = None,
    requester_pays: bool = False,
) -> Dict[str, Any]:
    """Public API parity with the reference's ``configure_s3_access``
    (odc/stac/__init__.py:20-36): resolve once, install into the
    executor-side reader environment. Returns the settings dict so callers
    can also attach it to a broadcast variable explicitly."""
    from .synth import restore_env

    settings, _ = get_aws_settings(
        profile=profile,
        region_name=region_name,
        aws_unsigned=aws_unsigned,
        requester_pays=requester_pays,
    )
    restore_env({"aws": settings})
    return settings
