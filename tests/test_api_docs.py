"""docs/API.md stays in sync with the live public surface."""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


def test_api_docs_fresh():
    import gen_api_docs
    with open(os.path.join(REPO, "docs", "API.md")) as f:
        committed = f.read()
    assert committed == gen_api_docs.generate(), (
        "docs/API.md is stale — regenerate with "
        "`PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python "
        "tools/gen_api_docs.py`")


def test_api_docs_cover_key_engines():
    with open(os.path.join(REPO, "docs", "API.md")) as f:
        text = f.read()
    for name in ["LandmarkAnalysis", "StreamingLandmarkAnalysis",
                 "VoronoiSiteGenerator", "JumpAnalysis",
                 "DiffusionAnalysis", "RDFAnalysis", "ArrheniusAnalysis",
                 "SiteTypeAnalysis", "PBCCalculator",
                 "SpmdLandmarkPipeline", "mxu_landmark"]:
        assert name in text, name
