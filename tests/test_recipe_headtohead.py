"""The recorded recipe head-to-head evidence must assert its own claim.

VERDICT r3 #5: the round-3 head-to-head was n=1 seed at toy scale with
"within noise" doing the heavy lifting. v2 (tools/recipe_headtohead.py)
runs >=3 seeds per side at 96x128 / 128 train images; this test loads the
committed artifact and asserts the overlap verdict programmatically, so a
future regression in either stack's recipe (or an artifact edited by
hand) fails CI instead of shipping as prose.
"""

import json
import os

import pytest

ART = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "run_artifacts",
    "recipe_headtohead_v2.json")


@pytest.mark.slow
def test_recipe_headtohead_v2_overlap():
    if not os.path.exists(ART):
        pytest.skip("recipe_headtohead_v2.json not recorded yet")
    with open(ART) as f:
        doc = json.load(f)
    summary = doc.get("summary", {})
    assert summary, "artifact has no summary — run --summarize"
    # the flagship's claim must be at full strength (>=3 seeds/side);
    # other nets assert overlap at whatever seed count is recorded
    assert summary.get("unet", {}).get("complete"), summary.get("unet")
    for net, s in summary.items():
        # our recipe lands within the combined 2-sigma seed spread of the
        # reference recipe, or ahead of it
        assert s["overlap"], (net, s)
    # and the task was the v2 scale, not the round-3 toy
    assert doc["task"]["n_train"] >= 128
    assert tuple(doc["task"]["hw"]) >= (96, 128)
