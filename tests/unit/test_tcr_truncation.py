"""TCR variable-domain truncation for the folding path (ESMFold OOM guard).

Sequences are the real 1FYT TCR chains (tests/data/cifs/1fyt-assembly1.cif,
entities 4/5): alpha = chain D, beta = chain E. Mirrors the reference's
behaviour at experiments/inference.py:455-475 + framedipt/protein/tcr.py:127.
"""
import pytest

from framedipt_tpu.data import tcr

# 1FYT TCR alpha (chain D): variable domain then the CA constant domain.
ALPHA_1FYT = (
    "QSVTQLGSHVSVSEGALVLLRCNYSSSVPPYLFWYVQYPNQGLQLLLKYTSAATLVKGINGFEAEFKKSETSFHLTKPSA"
    "HMSDAAEYFCAVSESPFGNEKLTFGTGTRLTIIPNIQNPDPAVYQLRDSKSSDKSVCLFTDFDSQTNVSQSKDSDVYITD"
    "KTVLDMRSMDFKSNSAVAWSNKSDFACANAFNNSIIPEDTFFPSPESSCDVK"
)
# 1FYT TCR beta (chain E).
BETA_1FYT = (
    "KVTQSSRYLVKRTGEKVFLECVQDMDHENMFWYRQDPGLGLRLIYFSYDVKMKEKGDIPEGYSVSREKKERFSLILESAS"
    "TNQTSMYLCASSSTGLPYGYTFGSGTRLTVVEDLNKVFPPEVAVFEPSEAEISHTQKATLVCLATGFFPDHVELSWWVNG"
    "KEVHSGVSTDPQPLKEQPALNDSRYSLSSRLRVSATFWQNPRNHFRCQVQFYGLSENDEWTQDRAKPVTQIVSAEAWGRA"
    "DCGFT"
)


@pytest.mark.parametrize(
    "seq,cdr3",
    [(ALPHA_1FYT, "CAVSESPFGNEKLTF"), (BETA_1FYT, "CASSSTGLPYGYTF")],
)
def test_cut_keeps_variable_domain_drops_constant(seq, cdr3):
    cut = tcr.cut_tcr_sequence(seq)
    assert seq.startswith(cut)
    # The CDR3 loop must survive the truncation...
    assert cdr3 in cut
    # ...and the constant domain must be gone: substantially shorter than
    # the full chain, in the 100-140 aa variable-domain range.
    assert 100 <= len(cut) <= 140, len(cut)
    assert len(cut) < len(seq) - 50


def test_cut_is_idempotent():
    cut = tcr.cut_tcr_sequence(ALPHA_1FYT)
    assert tcr.cut_tcr_sequence(cut) == cut or len(
        tcr.cut_tcr_sequence(cut)
    ) <= len(cut)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
