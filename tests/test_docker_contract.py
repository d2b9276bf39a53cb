"""Docker packaging contract (C29, docker/Dockerfile).

No container runtime exists on this machine and the build host has zero
network egress, so the image cannot be *built* here. This test pins the
next-best thing: every assumption the Dockerfile makes about the repo —
COPY sources, the editable install, the native-loader prebuild hook, the
CLI entrypoint — is validated against the working tree, so a rename or
module move can't silently rot the packaging. (Reference analog:
docker/Dockerfile + run.sh in /root/reference, built on ros:kinetic.)
"""

import importlib.util
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DOCKERFILE = os.path.join(REPO, "docker", "Dockerfile")


def _lines():
    with open(DOCKERFILE) as f:
        return [ln.strip() for ln in f if ln.strip()
                and not ln.strip().startswith("#")]


def test_copy_sources_exist():
    copies = [ln for ln in _lines() if ln.startswith("COPY")]
    assert copies, "Dockerfile has no COPY directives"
    for ln in copies:
        srcs = ln.split()[1:-1]  # COPY <src...> <dest>
        for src in srcs:
            assert os.path.exists(os.path.join(REPO, src)), \
                f"Dockerfile COPY source missing from repo: {src}"


def test_entrypoint_module_resolves():
    ep = [ln for ln in _lines() if ln.startswith("ENTRYPOINT")]
    assert ep and '"-m"' in ep[0]
    mod = re.findall(r'"([\w\.]+)"', ep[0])[-1]
    assert importlib.util.find_spec(mod) is not None, \
        f"Dockerfile entrypoint module not importable: {mod}"


def test_native_prebuild_hook_exists():
    """The RUN step prebuilding the native loader must reference a real
    callable."""
    runs = " ".join(ln for ln in _lines() if ln.startswith("RUN"))
    assert "native_loader" in runs
    from aloam_tpu.io import native_loader
    assert callable(native_loader.load_library)


def test_default_cmd_flags_are_real_cli_flags():
    """Every --flag in the default CMD is accepted by the CLI parser."""
    cmd = [ln for ln in _lines() if ln.startswith("CMD")]
    assert cmd
    flags = re.findall(r'"(--[\w-]+)"', cmd[0])
    assert flags
    from aloam_tpu import cli
    parser = cli.build_parser()
    known = set()
    for a in parser._actions:  # noqa: SLF001 — argparse's public-enough API
        known.update(a.option_strings)
    for fl in flags:
        assert fl in known, f"Dockerfile CMD flag unknown to the CLI: {fl}"
