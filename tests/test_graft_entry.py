"""Driver-contract safety: dryrun_multichip runs on small virtual meshes."""

import importlib.util
import os


def _load_graft():
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "__graft_entry__.py")
    spec = importlib.util.spec_from_file_location("graft_entry_test", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_dryrun_multichip_two_devices(capsys):
    g = _load_graft()
    g.dryrun_multichip(2)
    out = capsys.readouterr().out
    assert "dryrun_multichip OK" in out


def test_dryrun_multichip_odd_device_count(capsys):
    g = _load_graft()
    g.dryrun_multichip(3)  # odd -> pure-DP mesh
    out = capsys.readouterr().out
    assert "mesh=(3x1)" in out
