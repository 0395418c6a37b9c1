"""GUI controller (display-free core): press -> scan -> alignment text."""

import json
import os

GUI_MINIFAM = "/root/reference/c-core/minifam.hmm"
HERE = os.path.dirname(__file__)


def test_gui_controller_flow(tmp_path):
    from deciphon_tpu.gui import GuiController

    ctl = GuiController(workdir=str(tmp_path), engine="jax")
    seen = []
    dcp = ctl.press(GUI_MINIFAM, progress=seen.append)
    assert os.path.exists(dcp)
    assert seen[-1] == 100

    with open(os.path.join(HERE, "data_consensus.json")) as fp:
        seq = json.load(fp)[2]["seq"]
    try:
        view = ctl.scan_text(f">read1\n{seq}\n")
        assert "amino" in view and "state" in view
        # raw (non-FASTA) lines also work
        view2 = ctl.scan_text(seq)
        assert "amino" in view2
    finally:
        ctl.close()
