"""O2 WebDataset tar-shard source: unpack, group, and feed the ingest
operators (the reference's local-dataset path: tar -> (key, jpg, caption)
-> parse taxon tag, vector_db.py:74-80,150-180)."""

from __future__ import annotations

import io
import tarfile

from pyspark.sql import functions as F

from bioclip_vector_db_spark.operators import taxon
from bioclip_vector_db_spark.sources import webdataset as wds


def _make_shard(path, samples):
    with tarfile.open(path, "w") as tf:
        for key, members in samples.items():
            for member, payload in members.items():
                info = tarfile.TarInfo(name=f"{key}.{member}")
                info.size = len(payload)
                tf.addfile(info, io.BytesIO(payload))


CAPTION = (
    b"a photo of kingdom Animalia phylum Arthropoda class Insecta order "
    b"Lepidoptera family Geometridae genus Charissa species mucidaria "
    b"with common name coppery taupe."
)


def test_read_and_group(spark, tmp_path):
    _make_shard(
        tmp_path / "shard-0.tar",
        {
            "sample000": {"jpg": b"\xff\xd8fake0", "taxontag_com.txt": CAPTION},
            "sample001": {"jpg": b"\xff\xd8fake1", "taxontag_com.txt": b"no tags here."},
        },
    )
    _make_shard(
        tmp_path / "shard-1.tar",
        {"sample002": {"jpg": b"\xff\xd8fake2", "taxontag_com.txt": CAPTION}},
    )
    members = wds.read_webdataset(spark, str(tmp_path))
    assert members.count() == 6  # 3 samples x 2 members

    grouped = wds.group_samples(members)
    rows = {r.key: dict(r.members) for r in grouped.collect()}
    assert set(rows) == {"sample000", "sample001", "sample002"}
    assert bytes(rows["sample001"]["jpg"]) == b"\xff\xd8fake1"

    # The ingest projection: caption member -> parsed taxon struct (O8).
    parsed = taxon.parse_taxon_tags(
        grouped.select(
            "key",
            F.decode(F.col("members")["taxontag_com.txt"], "utf-8").alias("tag"),
        ),
        "tag",
    )
    by_key = {r.key: r for r in parsed.collect()}
    assert by_key["sample000"].genus == "Charissa"
    assert by_key["sample002"].species == "mucidaria"
    assert by_key["sample001"].kingdom == ""


def test_multidot_member_names(spark, tmp_path):
    """Members keep multi-dot suffixes whole (taxontag_com.txt), matching
    the reference's member naming."""
    _make_shard(tmp_path / "s.tar", {"k": {"taxontag_com.txt": b"x."}})
    rows = wds.read_webdataset(spark, str(tmp_path)).collect()
    assert rows[0].member == "taxontag_com.txt"
    assert rows[0].key == "k"


def test_shard_cache_reap_skips_locked_siblings(sf_dir):
    """Staging the document shards reaps other-stamp sibling cache dirs —
    but only those whose per-dir flock is free: a concurrent process
    still reading shards staged from an older fixture keeps its dir
    (ADVICE r6: the old reap rmtree'd unconditionally)."""
    import fcntl
    import os
    import tempfile

    from bioclip_vector_db_spark.sources.webdataset import _stage_document_shards

    tmp = tempfile.gettempdir()
    locked = os.path.join(tmp, "bvds_wds_shards_lockedold")
    free = os.path.join(tmp, "bvds_wds_shards_freeold")
    for d in (locked, free):
        os.makedirs(d, exist_ok=True)
    fh = open(f"{locked}.lock", "a+")
    try:
        fcntl.flock(fh, fcntl.LOCK_EX)
        out = _stage_document_shards(sf_dir)
        assert os.path.isdir(out)
        assert os.path.isdir(locked), "locked sibling must survive the reap"
        assert not os.path.exists(free), "lock-free stale sibling is reaped"
    finally:
        fcntl.flock(fh, fcntl.LOCK_UN)
        fh.close()
        import shutil

        shutil.rmtree(locked, ignore_errors=True)
        os.unlink(f"{locked}.lock", )
