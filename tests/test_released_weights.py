"""Released-weight OmegaFold integration hook (VERDICT r2 item 8).

The released OmegaFold checkpoint (~2 GB, `model.pt` from the OmegaFold
release) is not downloadable in this offline environment, so parity under
released weights is unprovable here (random-weight full-model parity <=2e-4
over 3 cycles IS proven, tests/test_omegafold_model.py). This test closes
the residual risk (a state_dict quirk only present in the release file)
the moment weights are available: drop the checkpoint anywhere and set

    OMEGAFOLD_RELEASE_PT=/path/to/release.pt pytest tests/test_released_weights.py

It then (a) imports the release through the torch-free importer and runs
our native extractor on a fixed sequence, checking output contracts and
numerical sanity, and (b) when the reference checkout + torch are also
present, runs the reference's own extractor on the same sequence and
compares embeddings directly (the strongest possible check — live A/B, no
committed statistics to go stale). Skips cleanly when weights are absent.
"""
import os

import numpy as np
import pytest

WEIGHTS = os.environ.get("OMEGAFOLD_RELEASE_PT", "/root/weights/release.pt")
SEQ = "MKTAYIAKQRQISFVKSHFSRQLEERLGLIEVQAPILSRVGDGTQDNLSGAEKAVQVKVKALPDAQ"
NUM_CYCLES = 2


@pytest.mark.skipif(not os.path.exists(WEIGHTS),
                    reason=f"released weights not present ({WEIGHTS}); "
                    "set OMEGAFOLD_RELEASE_PT")
def test_release_import_and_native_extraction():
    from dynamicpdb_tpu.models.omegafold.model import omegafold_embed
    from dynamicpdb_tpu.models.omegafold.pipeline import fasta2inputs
    from dynamicpdb_tpu.preprocess.extract_embeddings import (
        load_release_weights,
    )

    params, cfg = load_release_weights(WEIGHTS)
    (_name, cycles), = list(
        fasta2inputs([">q\n", SEQ + "\n"], num_cycle=NUM_CYCLES)
    )
    edge, node, _conf = omegafold_embed(params, cfg, cycles)
    L = len(SEQ)
    assert node.shape == (L, 256) and edge.shape == (L, L, 128)
    node, edge = np.asarray(node), np.asarray(edge)
    assert np.all(np.isfinite(node)) and np.all(np.isfinite(edge))
    # released-weight embeddings are structured, not degenerate
    assert 0.1 < np.std(node) and 0.1 < np.std(edge)
    assert np.abs(np.corrcoef(edge[0, :, 0], edge[1, :, 0])[0, 1]) < 0.999


@pytest.mark.skipif(not os.path.exists(WEIGHTS),
                    reason="released weights not present")
@pytest.mark.skipif(not os.path.isdir("/root/reference"),
                    reason="reference not mounted")
def test_release_embeddings_match_reference_extractor():
    """Live A/B vs the reference's vendored OmegaFold under the SAME
    released weights — the acceptance criterion of docs/OMEGAFOLD_PORT.md."""
    import sys

    sys.path.insert(0, "/root/reference/src/toolbox/OmegaFold")

    from omegafold import pipeline  # noqa: F401  (vendored reference tree)
    from omegafold.__main__ import OmegaFoldModel

    from dynamicpdb_tpu.models.omegafold.model import omegafold_embed
    from dynamicpdb_tpu.models.omegafold.pipeline import fasta2inputs
    from dynamicpdb_tpu.preprocess.extract_embeddings import (
        load_release_weights,
    )

    ref = OmegaFoldModel(WEIGHTS, device="cpu")
    fasta = [">q\n", SEQ + "\n"]
    ref_edge, ref_node = ref.inference(fasta, NUM_CYCLES)

    params, cfg = load_release_weights(WEIGHTS)
    (_name, cycles), = list(
        fasta2inputs(fasta, num_cycle=NUM_CYCLES)
    )
    edge, node, _conf = omegafold_embed(params, cfg, cycles)

    np.testing.assert_allclose(
        np.asarray(node), ref_node[0].cpu().numpy(), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(edge), ref_edge[0].cpu().numpy(), atol=2e-3
    )
