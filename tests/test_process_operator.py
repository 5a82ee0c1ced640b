"""External-process operator tests (U1-U5, §3.2 steps 5-10) with the
binaries stubbed — the e2e claim→execute→publish pipeline runs on real
files through the real mapInPandas path."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from encodesrv_spark.jobs.process import (
    ProcessConfig,
    run_claimed_jobs,
    run_job_row,
    stub_encode,
)

FMT = {
    "video_codec": "libx264",
    "video_bitrate": 1000,
    "video_resolution": "640x360",
    "aspect_ratio": "16:9",
    "audio_codec": "aac",
    "audio_bitrate": 64000,
    "audio_samplerate": 44100,
    "container": "mp4",
    "file_extension": "mp4",
    "preset_string": "-preset fast",
    "pass_count": 1,
    "args_beginning": "",
    "args_video": "",
    "args_audio": "",
    "args_end": "",
    "apply_mp4box": False,
    "normalise_level": "",
}


def mk_source(tmp_path, name="in.mov", data=b"fake-video-bytes"):
    src = tmp_path / name
    src.write_bytes(data)
    return str(src)


def job_row(tmp_path, jid=1, **over):
    row = {
        "id": jid,
        "video_id": 100 + jid,
        "source_file": mk_source(tmp_path, f"in{jid}.mov"),
        "destination_file": str(tmp_path / "out" / f"dest{jid}.mp4"),
        **FMT,
    }
    row.update(over)
    return row


def test_single_job_done(tmp_path):
    cfg = ProcessConfig(scratch_root=str(tmp_path))
    res = run_job_row(job_row(tmp_path), cfg)
    assert res["final_status"] == "Done"
    assert res["passes_run"] == 1
    dest = tmp_path / "out" / "dest1.mp4"
    assert dest.read_bytes().endswith(b"|encoded")
    assert res["size"] == dest.stat().st_size


def test_two_pass_runs_twice(tmp_path):
    cfg = ProcessConfig(scratch_root=str(tmp_path))
    res = run_job_row(job_row(tmp_path, pass_count=2), cfg)
    assert res["passes_run"] == 2
    assert res["final_status"] == "Done"


def test_missing_source_is_error(tmp_path):
    cfg = ProcessConfig(server="srv-x", scratch_root=str(tmp_path))
    row = job_row(tmp_path)
    row["source_file"] = str(tmp_path / "nope.mov")
    res = run_job_row(row, cfg)
    assert res["final_status"] == "srv-x - Error"
    assert "FileNotFoundError" in res["log"]


def test_loudness_stage_applies_gain(tmp_path):
    seen = {}

    def fake_analyze(path):
        return "Integrated loudness:\n  I: -30.0 LUFS\n"

    def capturing_encode(argv, cwd):
        seen["argv"] = argv
        stub_encode(argv, cwd)

    cfg = ProcessConfig(
        scratch_root=str(tmp_path), analyze_loudness=fake_analyze, encode=capturing_encode
    )
    res = run_job_row(job_row(tmp_path, normalise_level="-23"), cfg)
    assert res["final_status"] == "Done"
    # gain = 10^((-23 - -30)/20) = 10^0.35
    joined = " ".join(seen["argv"])
    assert "volume=2.238" in joined
    assert "loudness" in res["log"]


def test_mp4box_stage_gated(tmp_path):
    calls = []
    cfg = ProcessConfig(scratch_root=str(tmp_path), apply_mp4box=calls.append)
    run_job_row(job_row(tmp_path, apply_mp4box=True), cfg)
    assert len(calls) == 1
    run_job_row(job_row(tmp_path, jid=2, apply_mp4box=False), cfg)
    assert len(calls) == 1


def test_file_sequence_publish(tmp_path):
    """Thumbnail '%05d' destinations publish every matching scratch file
    and sum their sizes (reference job.py:298-306 + A2)."""

    def thumb_encode(argv, cwd):
        for i in range(3):
            with open(os.path.join(cwd, f"thumb_{i:05d}.png"), "wb") as f:
                f.write(b"p" * (10 + i))

    cfg = ProcessConfig(scratch_root=str(tmp_path), encode=thumb_encode)
    row = job_row(tmp_path, destination_file=str(tmp_path / "out" / "thumb_%05d.png"))
    res = run_job_row(row, cfg)
    assert res["final_status"] == "Done"
    assert res["size"] == 10 + 11 + 12
    assert sorted(os.listdir(tmp_path / "out")) == [
        "thumb_00000.png",
        "thumb_00001.png",
        "thumb_00002.png",
    ]
    assert "moved 3 files" in res["log"]


def test_mapinpandas_batch(spark, tmp_path):
    """The distributed path: N jobs through mapInPandas, mixed outcomes."""
    rows = [job_row(tmp_path, jid=i) for i in range(1, 5)]
    rows[2]["source_file"] = str(tmp_path / "missing.mov")
    df = spark.createDataFrame(rows)
    out = run_claimed_jobs(df, ProcessConfig(scratch_root=str(tmp_path)))
    got = {r["id"]: r["final_status"] for r in out.collect()}
    assert got[1] == got[2] == got[4] == "Done"
    assert "Error" in got[3]


def test_progress_side_channel(spark, tmp_path):
    """ST7: per-stage progress events are emitted from inside the
    task (append-only JSON side channel) and read back as a DataFrame;
    the latest event per job gives the live status view."""
    import encodesrv_spark.jobs.process as P
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    src = tmp_path / "in.mov"
    src.write_bytes(b"x" * 100)
    pdir = str(tmp_path / "progress")
    cfg = P.ProcessConfig(scratch_root=str(tmp_path), progress_dir=pdir)
    row = {
        "id": 42, "source_file": str(src),
        "destination_file": str(tmp_path / "out" / "a.mp4"),
        "pass_count": 2, "video_id": None,
        "container": "mp4", "video_codec": "libx264", "video_bitrate": 1000,
        "file_extension": "mp4",
    }
    res = P.run_job_row(row, cfg)
    assert res["final_status"] == "Done"

    events = P.progress_df(spark, pdir)
    stages = [r["stage"] for r in events.orderBy("seq").collect()]
    assert stages[0] == "copy" and "pass1" in stages and "pass2" in stages
    assert stages[-1] == "terminal"
    # latest-status view (the bot/status surface)
    w = W.partitionBy("id").orderBy(F.desc("seq"))
    latest = (
        events.withColumn("rn", F.row_number().over(w)).filter("rn = 1").first()
    )
    assert latest["status"] == "Done"


def test_publish_is_idempotent_on_retry(tmp_path):
    """§7.3.4: a retried task (same job row, rerun) must converge to
    the same published bytes — staged scratch + move-last means a
    retry overwrites with identical content instead of corrupting."""
    import encodesrv_spark.jobs.process as P

    src = tmp_path / "in.mov"
    src.write_bytes(b"payload")
    dest = tmp_path / "out" / "a.mp4"
    cfg = P.ProcessConfig(scratch_root=str(tmp_path))
    row = {
        "id": 7, "source_file": str(src), "destination_file": str(dest),
        "pass_count": 1, "video_id": None,
        "container": "mp4", "video_codec": "libx264", "video_bitrate": 1000,
        "file_extension": "mp4",
    }
    r1 = P.run_job_row(dict(row), cfg)
    first_bytes = dest.read_bytes()
    r2 = P.run_job_row(dict(row), cfg)  # simulated task retry
    assert r1["final_status"] == r2["final_status"] == "Done"
    assert dest.read_bytes() == first_bytes
    assert r1["size"] == r2["size"] == len(first_bytes)


def test_stage_timeout_yields_error_status(tmp_path):
    """A wedged encode stage must hit stage_timeout_s and turn the job
    into '<server> - Error' with the timeout recorded — the task makes
    progress even when the external binary never returns."""
    import time

    from encodesrv_spark.jobs.process import ProcessConfig, run_job_row

    src = tmp_path / "in.mov"
    src.write_bytes(b"x")

    def wedged_encode(argv, cwd):
        time.sleep(5)

    cfg = ProcessConfig(
        server="srv",
        encode=wedged_encode,
        scratch_root=str(tmp_path),
        stage_timeout_s=0.2,
    )
    row = {
        "id": 1,
        "source_file": str(src),
        "destination_file": str(tmp_path / "out" / "o.mp4"),
        "video_id": None,
        "pass_count": 1,
    }
    t0 = time.monotonic()
    out = run_job_row(row, cfg)
    assert time.monotonic() - t0 < 4  # did not wait out the wedge
    assert out["final_status"] == "srv - Error"
    assert "StageTimeout" in out["log"]
