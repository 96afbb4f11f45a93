from __future__ import annotations

import os

import pytest

from allora_indexer_spark.session import get_spark

SF_SMALL = os.environ.get("ALLORA_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_MEDIUM = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="allora-indexer-spark-tests", master="local[4]",
                  shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMALL


@pytest.fixture(params=["posix", "memory"])
def seam_backend(request, monkeypatch):
    """Run a test against both manifest-storage backends: the default
    POSIX files-and-flock implementation and the in-memory
    conditional-PUT fake (the object-store adapter template). The seam
    contract (plans/storage.py) must hold identically on both."""
    from allora_indexer_spark.plans import storage, warehouse

    if request.param == "memory":
        monkeypatch.setattr(
            warehouse, "STORAGE", storage.InMemoryManifestStorage()
        )
    return request.param
