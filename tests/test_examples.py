"""Examples-rot guard: every shipped recipe in examples/ must parse
against the current CLI and produce a valid pipeline/channelizer config.
The reference's launcher scripts (FT8dual, SSTV, start_cw2, TEST) are
its de-facto user documentation; ours must not silently drift when
flags change."""

import glob
import os
import re
import shlex

import pytest

from pysdr_tpu import app as app_mod

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLES = sorted(glob.glob(os.path.join(HERE, "examples", "*.sh")))

# flags that start servers / touch hardware / pace in realtime — the
# config they produce is still fully validated, the side effects are not
# wanted in a unit test
_STRIP_FLAGS = {"--realtime", "--hamlib", "--stereo"}
_STRIP_WITH_ARG = {"--web", "--udp-port", "--fifo", "--wav",
                   "--watchdog-log", "--rtl-tcp", "--save-dir"}


def _extract_argvs(path: str) -> list[list[str]]:
    """Every `python -m pysdr_tpu ...` invocation's argument list from a
    recipe (shell-continuation-aware, comments ignored)."""
    text = open(path).read().replace("\\\n", " ")
    out = []
    for line in text.splitlines():
        line = line.split("#")[0]
        m = re.search(r"python -m pysdr_tpu\s+(.*)", line)
        if not m:
            continue
        body = m.group(1).replace('"$@"', "")
        body = body.replace("$REPO", HERE).replace("${REPO}", HERE)
        body = body.replace("$FIX",
                            os.path.join(HERE, "tests", "fixtures"))
        body = body.replace("$HOST", "127.0.0.1:1234")
        body = body.replace("$FREQ", "96.1")
        argv, skip = [], False
        for a in shlex.split(body):
            if skip:
                skip = False
                continue
            if a in _STRIP_FLAGS:
                continue
            if a in _STRIP_WITH_ARG:
                skip = True
                continue
            argv.append(a)
        out.append(argv)
    return out


@pytest.mark.parametrize("path", EXAMPLES, ids=os.path.basename)
def test_example_recipe_builds_a_valid_config(path):
    argvs = _extract_argvs(path)
    assert argvs, "recipe does not invoke python -m pysdr_tpu"
    for argv in argvs:
        args = app_mod.build_parser().parse_args(argv)  # flags exist
        if args.channelize:
            bank, src, cfg = app_mod.build_channelizer(args)
            assert bank.n_rx == int(args.channelize)
            if hasattr(src, "close"):
                src.close()
        else:
            cfg = app_mod.build_config(args)           # validates layout
            assert cfg.n_rx >= 1
        # recipes that reference files must point at existing ones
        if args.replay:
            assert os.path.exists(args.replay[0]), args.replay[0]
        if args.hop_schedule:
            from pysdr_tpu.runtime.hopper import load_hop_schedule
            sched = load_hop_schedule(args.hop_schedule)
            assert sched, "empty hop schedule"
