"""Command-template assembler tests (F6/U5) — property-based over
truthy/empty/None param subsets, matching the reference's gate
semantics (/root/reference/encodesrv/job.py:235-248)."""

from __future__ import annotations

from hypothesis import given, strategies as st

from encodesrv_spark.functions.argv import (
    assemble_argv,
    assemble_command,
    synthesize_params,
)

BASE_JOB = {
    "id": 1,
    "source_file": "/mnt/videos/show.mov",
    "destination_file": "/mnt/out/show.mp4",
}

BASE_FMT = {
    "video_codec": "libx264",
    "video_bitrate": 1_500_000,
    "video_resolution": "1280x720",
    "aspect_ratio": "16:9",
    "audio_codec": "aac",
    "audio_bitrate": 128_000,
    "audio_samplerate": 44100,
    "container": "mp4",
    "file_extension": "mp4",
    "preset_string": "-preset slow",
    "pass_count": 2,
    "args_beginning": None,
    "args_video": "",
    "args_audio": None,
    "args_end": None,
}


def params(pass_no=1, **overrides):
    merged = {**BASE_FMT, **overrides}
    return synthesize_params(BASE_JOB, merged, "/scratch/j1", pass_no=pass_no)


def test_full_command_shape():
    cmd = assemble_command(params())
    assert cmd.startswith("ffmpeg ")
    assert '-i "/scratch/j1/show.mov"' in cmd
    assert "-c:v libx264" in cmd
    assert "-b:v 1500000" in cmd
    assert "-pass 1" in cmd
    assert '-passlogfile "/scratch/j1/pass.log"' in cmd
    assert "-threads 0" in cmd  # '0' is auto and must still be emitted
    assert cmd.endswith('-y "/scratch/j1/out.mp4"')


def test_argv_quoting():
    argv = assemble_argv(params())
    # shlex strips the quotes; paths with spaces stay one token
    assert "/scratch/j1/show.mov" in argv
    assert argv[0] == "ffmpeg"


def test_falsy_params_suppress_fragments():
    cmd = assemble_command(params(args_video="", args_audio=None, audio_bitrate=0))
    assert "-b:a" not in cmd
    assert "  " not in cmd  # no double spaces from dropped fragments


def test_single_pass_drops_pass_flags():
    cmd = assemble_command(params(pass_count=1))
    assert "-pass" not in cmd
    assert "-passlogfile" not in cmd


def test_pass_number_substitution():
    assert "-pass 2" in assemble_command(params(pass_no=2))


def test_template_newlines_flattened():
    cmd = assemble_command(params(args_video="-x\n-y\t-z"))
    assert "\n" not in cmd and "\t" not in cmd


@given(
    st.dictionaries(
        st.sampled_from(["args_beginning", "args_video", "args_audio", "args_end"]),
        st.one_of(st.none(), st.just(""), st.text(alphabet="abc-", min_size=1)),
    )
)
def test_truthy_gate_property(extra):
    """A fragment appears iff its parameter is truthy."""
    cmd = assemble_command(params(**extra))
    for key, val in extra.items():
        if val:
            assert val.translate(str.maketrans("\n\t\r", "   ")) in cmd
    argv = assemble_argv(params(**extra))
    assert argv[0] == "ffmpeg"
