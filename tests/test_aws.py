"""S11 AWS credentialization tests — env-var resolution chains only (no
network in this container; the EC2 metadata probe is exercised as the
guarded fail-fast path)."""

from __future__ import annotations

import pytest

from odc_stac_spark.sources import aws as A


def test_region_env_chain(monkeypatch):
    monkeypatch.delenv("AWS_REGION", raising=False)
    monkeypatch.setenv("AWS_DEFAULT_REGION", "eu-central-1")
    assert A.auto_find_region() == "eu-central-1"
    monkeypatch.setenv("AWS_REGION", "ap-southeast-2")  # AWS_REGION wins
    assert A.auto_find_region() == "ap-southeast-2"


def test_region_default_and_error(monkeypatch):
    monkeypatch.delenv("AWS_REGION", raising=False)
    monkeypatch.delenv("AWS_DEFAULT_REGION", raising=False)
    monkeypatch.setattr(A, "ec2_current_region", lambda timeout=0.25: None)
    assert A.auto_find_region(default="us-west-2") == "us-west-2"
    with pytest.raises(ValueError, match="region"):
        A.auto_find_region()


def test_unsigned_env_parse(monkeypatch):
    monkeypatch.delenv("AWS_UNSIGNED", raising=False)
    monkeypatch.delenv("AWS_NO_SIGN_REQUEST", raising=False)
    assert A.aws_unsigned_from_env() is False
    monkeypatch.setenv("AWS_NO_SIGN_REQUEST", "YES")
    assert A.aws_unsigned_from_env() is True
    monkeypatch.setenv("AWS_NO_SIGN_REQUEST", "no")
    assert A.aws_unsigned_from_env() is False
    monkeypatch.setenv("AWS_UNSIGNED", "1")  # AWS_UNSIGNED checked first
    assert A.aws_unsigned_from_env() is True


def test_creds_retry_backoff(monkeypatch):
    calls = []

    class FakeSession:
        def __init__(self, fail_n):
            self.fail_n = fail_n

        def get_credentials(self):
            calls.append(1)
            return None if len(calls) <= self.fail_n else "CREDS"

    sleeps = []
    monkeypatch.setattr(A.time, "sleep", sleeps.append)
    assert A.get_creds_with_retry(FakeSession(2), max_tries=5, sleep=0.1) == "CREDS"
    assert len(calls) == 3
    assert sleeps == [0.1, 0.2]  # exponential backoff

    calls.clear()
    sleeps.clear()
    assert A.get_creds_with_retry(FakeSession(99), max_tries=3, sleep=0.1) is None
    assert len(calls) == 3


def test_get_aws_settings_from_env_creds(monkeypatch):
    """botocore resolves static creds from env vars without any network."""
    monkeypatch.setenv("AWS_ACCESS_KEY_ID", "AKIATEST")
    monkeypatch.setenv("AWS_SECRET_ACCESS_KEY", "sekrit")
    monkeypatch.setenv("AWS_SESSION_TOKEN", "tok123")
    monkeypatch.setenv("AWS_DEFAULT_REGION", "us-east-2")
    monkeypatch.delenv("AWS_UNSIGNED", raising=False)
    monkeypatch.delenv("AWS_NO_SIGN_REQUEST", raising=False)
    settings, creds = A.get_aws_settings()
    assert settings["region_name"] == "us-east-2"
    assert settings["aws_access_key_id"] == "AKIATEST"
    assert settings["aws_secret_access_key"] == "sekrit"
    assert settings["aws_session_token"] == "tok123"
    assert settings["requester_pays"] is False
    assert creds is not None


def test_get_aws_settings_unsigned(monkeypatch):
    monkeypatch.setenv("AWS_DEFAULT_REGION", "us-east-1")
    settings, creds = A.get_aws_settings(aws_unsigned=True)
    assert settings == {"region_name": "us-east-1", "aws_unsigned": True}
    assert creds is None


def test_configure_s3_access_installs_executor_env(monkeypatch):
    from odc_stac_spark.sources.synth import capture_env

    monkeypatch.setenv("AWS_DEFAULT_REGION", "us-east-1")
    settings = A.configure_s3_access(aws_unsigned=True)
    assert capture_env()["aws"] == settings
