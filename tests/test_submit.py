"""spark-submit driver script: job execution + manifest resume."""

import json
import shutil
import sys
import tempfile

import pytest

sys.path.insert(0, "/root/repo")
import submit  # noqa: E402

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def tmp(request):
    d = tempfile.mkdtemp()
    request.addfinalizer(lambda: shutil.rmtree(d, ignore_errors=True))
    return d


def test_submit_tiles_job_and_resume(spark, tmp, capsys):
    rc = submit.main([
        "--images", f"synth:{SF}:20", "--output", tmp,
        "--job", "tiles", "--resume",
    ])
    assert rc == 0
    out1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out1["rows"] > 0

    # widen the input: resume processes only the new images, totals grow
    rc = submit.main([
        "--images", f"synth:{SF}:40", "--output", tmp,
        "--job", "tiles", "--resume",
    ])
    assert rc == 0
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["rows"] > out1["rows"]

    m = spark.read.parquet(f"{tmp}/manifest")
    assert m.filter("stage = 'tiles'").count() > 20
    assert "partition_id" in m.columns
