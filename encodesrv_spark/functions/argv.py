"""Command-template assembly (F6/U5) — the reference's ffmpeg argv
builder re-expressed as a pure, testable function.

Semantics preserved from /root/reference/encodesrv/job.py:30-51,235-248:

* an ordered template table; each entry is gated on one parameter
* an entry is emitted only when its parameter is present AND truthy
  (so NULL, '' and 0 all suppress the fragment — job.py:236-242)
* newline/tab/CR are flattened to spaces (job.py:239)
* `str.format(**args)` substitution, space-join, then shlex.split
  (job.py:243-248)
* synthesized params: _SourceFile, _PassLogFile, _VPre (from
  preset_string — job.py:178), _TempDest, _Pass (job.py:173-183,227-233)

Pure Python so it runs identically driver-side, in tests, and inside
the pandas-batched process operator.
"""

from __future__ import annotations

import shlex

# (gate parameter, fragment template). Order matters — ffmpeg argv is
# positional by section: input, video, audio, extras, output.
TEMPLATE_TABLE: list[tuple[str, str]] = [
    ("args_beginning", "{args_beginning}"),
    ("_SourceFile", '-i "{_SourceFile}"'),
    ("video_codec", "-c:v {video_codec}"),
    ("video_bitrate", "-b:v {video_bitrate}"),
    ("video_resolution", "-s {video_resolution}"),
    ("aspect_ratio", "-aspect {aspect_ratio}"),
    ("_VPre", "{_VPre}"),
    ("pass_count", "-pass {_Pass}"),
    ("_PassLogFile", '-passlogfile "{_PassLogFile}"'),
    ("args_video", "{args_video}"),
    ("audio_codec", "-c:a {audio_codec}"),
    ("audio_bitrate", "-b:a {audio_bitrate}"),
    ("audio_samplerate", "-ar {audio_samplerate}"),
    ("args_audio", "{args_audio}"),
    ("threads", "-threads {threads}"),
    ("args_end", "{args_end}"),
    ("container", "-f {container}"),
    ("_TempDest", '-y "{_TempDest}"'),
]


def _truthy(v: object) -> bool:
    # matches the reference's `if args.get(k)` gate: None/''/0/False out
    return bool(v)


def assemble_command(args: dict, binary: str = "ffmpeg") -> str:
    """Build the full command string for one pass (pre-shlex)."""
    parts = [binary]
    flatten = str.maketrans("\n\t\r", "   ")
    for gate, template in TEMPLATE_TABLE:
        if not _truthy(args.get(gate)):
            continue
        # translate AFTER substitution so newlines in parameter values
        # are flattened too (the reference only translated the template
        # — job.py:239 — letting value newlines leak into argv; fixed
        # per SURVEY §7.3.3, observable commands unchanged for clean
        # inputs)
        parts.append(template.format(**args).translate(flatten))
    return " ".join(parts)


def assemble_argv(args: dict, binary: str = "ffmpeg") -> list[str]:
    """argv for subprocess execution (shlex semantics, quotes honored)."""
    return shlex.split(assemble_command(args, binary))


def synthesize_params(
    job: dict, fmt: dict, scratch_dir: str, pass_no: int = 1, threads: int = 0
) -> dict:
    """Merge job + format rows into the substitution dict, adding the
    synthesized keys (reference job.py:162-183). NULLs coalesce to ''
    (P7, job.py:171)."""
    args = {k: ("" if v is None else v) for k, v in {**fmt, **job}.items()}
    src_name = args["source_file"].rsplit("/", 1)[-1]
    ext = args.get("file_extension") or "mp4"
    args["_SourceFile"] = f"{scratch_dir}/{src_name}"
    args["_PassLogFile"] = f"{scratch_dir}/pass.log"
    # reference quirk (SURVEY §7.3.3): _VPre is fed by preset_string,
    # vpre_string is fetched-but-unused; we keep the fixed behavior
    args["_VPre"] = args.get("preset_string", "")
    args["_TempDest"] = f"{scratch_dir}/out.{ext}"
    args["_Pass"] = pass_no
    # string '0' stays truthy: '-threads 0' (= auto) must still be
    # emitted, matching the reference's hardcoded flag (job.py:46)
    args["threads"] = str(threads)
    # a 1-pass format must not emit -pass/-passlogfile
    if int(args.get("pass_count") or 1) <= 1:
        args["pass_count"] = 0
        args["_PassLogFile"] = ""
    return args
