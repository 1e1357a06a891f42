"""Units for the NOMEN parser (reference find_nomen parity cases,
commons.py:510-711) and the genotype barcode digit map."""

import pandas as pd
import pytest

from howard_ray.ops.genotype import _barcode_digit
from howard_ray.ops.nomen import find_nomen_batch


def nomen_one(hgvs: str, preferred=None) -> dict:
    df = find_nomen_batch(pd.Series([hgvs]), preferred=preferred or {})
    return df.iloc[0].to_dict()


def test_nomen_basic_fields():
    d = nomen_one("TP53:NM_000546.5:c.215C>G:p.Pro72Arg:exon4")
    assert d["GNOMEN"] == "TP53"
    assert d["TVNOMEN"] == "NM_000546.5"
    assert d["TNOMEN"] == "NM_000546"
    assert d["VNOMEN"] == "5"
    assert d["CNOMEN"] == "c.215C>G"
    assert d["PNOMEN"] == "p.Pro72Arg"
    assert d["ENOMEN"] == "exon4"
    # pattern GNOMEN:TNOMEN:ENOMEN:CNOMEN:RNOMEN:NNOMEN:PNOMEN
    assert d["NOMEN"] == "TP53:NM_000546:exon4:c.215C>G:p.Pro72Arg"
    # 1 (TV) + 2 (NM) + 1 (c.) + 1 (p.) + 1 (exon)
    assert d["nomen_score"] == 6


def test_nomen_nr_n_r_tokens():
    d = nomen_one("NR_123456.1:n.100A>G")
    assert d["TNOMEN"] == "NR_123456"
    assert d["NNOMEN"] == "n.100A>G"
    assert d["nomen_score"] == 3  # 1 (TV) + 1 (NR) + 1 (n.)
    d = nomen_one("NM_1.1:r.5del")
    assert d["RNOMEN"] == "r.5del"


def test_nomen_protein_transcript_token():
    # NP_ scores +1 but fills no NOMEN-pattern field
    d = nomen_one("NP_000537.3:p.Pro72Arg")
    assert d["PNOMEN"] == "p.Pro72Arg"
    assert d["TNOMEN"] is None
    assert d["nomen_score"] == 2


def test_nomen_candidate_selection_first_wins_ties():
    two = "GENEA:NM_1.1:c.1A>G,GENEB:NM_2.1:c.2A>G"
    d = nomen_one(two)
    assert d["GNOMEN"] == "GENEA"  # equal scores -> first kept


def test_nomen_preferred_transcript_boost():
    pref = {"NM_2": 1}
    d = nomen_one("GENEA:NM_1.1:c.1A>G:p.X1Y:exon1,NM_2.9:c.2A>G",
                  preferred=pref)
    # B: 1+2+1 + 100*(1-1+1) = 104 beats A's 7
    assert d["TNOMEN"] == "NM_2"
    assert d["nomen_score"] == 104


def test_nomen_empty_and_multi_row():
    df = find_nomen_batch(pd.Series([None, "GENE", "NM_5.2:c.1A>G"]))
    assert df["NOMEN"][0] == ""
    assert df["GNOMEN"][1] == "GENE"
    assert df["TVNOMEN"][2] == "NM_5.2"


@pytest.mark.parametrize("gt,digit", [
    ("0/0", "0"), ("./.", "0"), ("0/1", "1"), ("1/0", "1"),
    ("1/1", "2"), ("1/2", "1"), ("2|2", "2"), ("0|1", "1"), (".", "0"),
])
def test_barcode_digit_map(gt, digit):
    # genotype_barcode semantics (commons.py:1101-1187)
    assert _barcode_digit(pd.Series([gt]))[0] == digit
