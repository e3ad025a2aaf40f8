"""Neo4j 3.5 binary store reader (ppr_tpu/graph/neostore.py).

The reference opens target/got.db directly (PPR.java:52-60); these tests
pin our JVM-free parser against the committed binary store, using the
import CSVs (the store's own provenance, reference README.md:17-20) as
the independent oracle: the decoded graph and every short-string-encoded
name must match exactly.
"""

import os

import numpy as np
import pytest

GOT_DB = "/root/reference/target/got.db"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(GOT_DB), reason="reference store not present"
)


@pytest.fixture(scope="module")
def store_ds():
    from ppr_tpu.graph.neostore import load_neo4j_store

    return load_neo4j_store(GOT_DB)


@pytest.fixture(scope="module")
def csv_ds():
    from ppr_tpu.graph.io import load_got

    return load_got()


def test_store_graph_equals_csv(store_ds, csv_ds):
    assert store_ds.graph.n == csv_ds.graph.n == 107
    assert store_ds.graph.m == csv_ds.graph.m == 352
    m = store_ds.graph.m
    e_store = set(zip(
        np.asarray(store_ds.graph.edge_src)[:m].tolist(),
        np.asarray(store_ds.graph.edge_dst)[:m].tolist(),
    ))
    e_csv = set(zip(
        np.asarray(csv_ds.graph.edge_src)[:m].tolist(),
        np.asarray(csv_ds.graph.edge_dst)[:m].tolist(),
    ))
    assert e_store == e_csv


def test_store_names_decode_exactly(store_ds, csv_ds):
    """Every name survives the LongerShortString round trip — including
    the multi-block case (char 4 of 'Aemon' straddles blocks 0/1)."""
    assert store_ds.names == csv_ds.names
    assert store_ds.names[0] == "Aemon"


def test_property_key_tokens():
    from ppr_tpu.graph.neostore import read_property_key_tokens

    tokens = read_property_key_tokens(GOT_DB)
    assert tokens.get(0) == "name"


def test_is_neo4j_store(tmp_path):
    from ppr_tpu.graph.neostore import is_neo4j_store

    assert is_neo4j_store(GOT_DB)
    assert not is_neo4j_store(str(tmp_path))
    assert not is_neo4j_store("/root/reference/dataset/got")


def test_cli_dataset_dispatch():
    """--db target/got.db takes the binary-store path; --db dataset/got
    keeps taking the CSV path; both yield the same dataset."""
    from ppr_tpu.cli import load_dataset

    ds_store = load_dataset(GOT_DB)
    ds_csv = load_dataset("/root/reference/dataset/got")
    assert ds_store.graph.n == ds_csv.graph.n
    assert ds_store.graph.m == ds_csv.graph.m
    assert ds_store.names == ds_csv.names


def test_query_through_store_loaded_graph(store_ds):
    """End-to-end: a FORA top-k query on the store-loaded graph returns
    named hits (the reference's primary query surface on this DB)."""
    from ppr_tpu.service import PPRService

    svc = PPRService.from_dataset(store_ds, alpha=0.15, k=10, seed=3)
    hits = svc.top_k([3], k=10)[0]
    assert len(hits) >= 1
    assert all(isinstance(h.name, str) and h.name for h in hits)


def test_short_string_encodings_unit():
    """Decode-table unit checks for encodings beyond the ALPHANUM the GOT
    store exercises: build blocks by the inverse bit layout and decode."""
    from ppr_tpu.graph.neostore import _decode_short_string

    def make_blocks(enc, bpc, codes, key=0):
        total_bits = 39 + bpc * len(codes)
        nblocks = -(-total_bits // 64)
        blocks = [0] * max(nblocks, 1)
        def put(value, nbits, pos):
            for j in range(nbits):
                b, o = divmod(pos + j, 64)
                blocks[b] |= ((value >> j) & 1) << o
            return pos + nbits
        pos = put(key, 24, 0)
        pos = put(11, 4, pos)            # SHORT_STRING
        pos = put(enc, 5, pos)
        pos = put(len(codes), 6, pos)
        for c in codes:
            pos = put(c, bpc, pos)
        return blocks

    # LOWER(4, 5 bits): 'a'=1 .. 'z'=26, 0=' '
    assert _decode_short_string(make_blocks(4, 5, [8, 9, 0, 26])) == "hi z"
    # UPPER(3, 5 bits)
    assert _decode_short_string(make_blocks(3, 5, [7, 15, 20])) == "GOT"
    # NUMERICAL(1, 4 bits): digits 0-9 inline
    assert _decode_short_string(make_blocks(1, 4, [4, 2])) == "42"
    # LATIN1(10, 8 bits): code points direct
    assert _decode_short_string(make_blocks(10, 8, [0xE9, 0x61])) == "\xe9a"
    # UTF8(0, 8 bits): raw bytes
    assert _decode_short_string(make_blocks(0, 8, list("ok".encode()))) == "ok"
    # ALPHANUM(7, 6 bits): EUROPEAN+0x40 delegation incl. digits 5-9
    assert _decode_short_string(
        make_blocks(7, 6, [0x01, 0x21, 0x3B, 0x1B, 0x00])
    ) == "Aa50 "


def test_relationship_type_tokens_and_filter():
    from ppr_tpu.graph.neostore import (
        load_neo4j_store, read_relationship_type_tokens, read_label_tokens,
    )

    tokens = read_relationship_type_tokens(GOT_DB)
    assert tokens.get(0) == "Relation"
    ds = load_neo4j_store(GOT_DB, rel_type="Relation")
    assert ds.graph.m == 352  # single-type store: filter keeps everything
    with pytest.raises(ValueError, match="no relationship type"):
        load_neo4j_store(GOT_DB, rel_type="KNOWS")
    # the Person label TOKEN exists (created by the reference's schema/
    # index setup, PPR.java:70-119) but the import CSV had no :LABEL
    # column, so node records themselves are unlabeled
    assert read_label_tokens(GOT_DB) == {0: "Person"}


def test_cli_rel_flag_reaches_store_loader():
    from ppr_tpu.cli import load_dataset

    ds = load_dataset(GOT_DB, rel="Relation")
    assert ds.graph.m == 352
    with pytest.raises(ValueError):
        load_dataset(GOT_DB, rel="NOPE")
