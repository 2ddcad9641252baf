#!/usr/bin/env python3
"""Generate the hash-repair golden: build a deterministic input tree of
.ttl.gz files, then produce the EXPECTED output by driving the
reference implementation's own update function
(/root/reference/src/geosparql-etl/sha256-hash/update_ttl_gz_from_json.py
 — stdlib-only, imported directly) followed by the loinc-removal
semantics of remove_loinc_xargs.sh (`grep -Fv "<exact line>"`).

Input tree  -> src/test/resources/fixtures/hashrepair/input/
slide json  -> src/test/resources/fixtures/hashrepair/slide_hashes.json
Expected    -> src/test/resources/golden/hashrepair/<slide>.svs/<file>.txt
               (decompressed text: gzip bytes are mtime-dependent, so
                the spec compares decompressed content)

Covers: sha256 replacement (multiple occurrences, mixed-case hex),
md5 -> sha256 upgrade, no-urn pass-through, unmapped-slide skip, and
loinc line removal applied to every file regardless of mapping.
"""
import gzip
import importlib.util
import json
import shutil
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
REF = Path("/root/reference/src/geosparql-etl/sha256-hash/update_ttl_gz_from_json.py")
FIX = REPO / "src/test/resources/fixtures/hashrepair"
GOLD = REPO / "src/test/resources/golden/hashrepair"
LOINC_LINE = "@prefix loinc: <http://loinc.org/rdf/> ."

spec = importlib.util.spec_from_file_location("ref_update", REF)
ref = importlib.util.module_from_spec(spec)
spec.loader.exec_module(ref)

INPUTS = {
    # mapped slide: two sha256 urns + loinc line
    "slideA.svs/batch_000001.ttl.gz": (
        LOINC_LINE + "\n"
        "@prefix hal: <https://halcyon.is/ns/> .\n"
        "<urn:sha256:AAbb01> hal:x \"1\" .\n"
        "<urn:sha256:DEADbeef> hal:y \"2\" .\n"),
    # mapped slide: md5 urn -> upgraded to sha256
    "slideA.svs/batch_000002.ttl.gz": (
        "<urn:md5:0123456789abcdef> hal:z \"3\" .\n"),
    # mapped slide: no urn at all -> reference reports failure, file
    # content unchanged (loinc still removed by the separate pass)
    "slideB.svs/one.ttl.gz": (
        LOINC_LINE + "\n"
        "<urn:uuid:not-a-hash> hal:w \"4\" .\n"),
    # unmapped slide: hash pass skips the folder entirely
    "slideC.svs/two.ttl.gz": (
        LOINC_LINE + "\n"
        "<urn:sha256:ffff> hal:v \"5\" .\n"),
}

MAPPING = [
    {"slide": "slideA.svs", "hash": "a" * 64},
    {"slide": "slideB.svs", "hash": "b" * 64},
]


def main():
    for d in (FIX, GOLD):
        if d.exists():
            shutil.rmtree(d)
    (FIX / "input").mkdir(parents=True)
    GOLD.mkdir(parents=True)

    for rel, text in INPUTS.items():
        p = FIX / "input" / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        # mtime=0 => deterministic gzip bytes for the committed fixture
        with open(p, "wb") as fh:
            with gzip.GzipFile(fileobj=fh, mode="wb", mtime=0) as gz:
                gz.write(text.encode("utf-8"))
    (FIX / "slide_hashes.json").write_text(json.dumps(MAPPING, indent=1))

    # ---- expected output: reference hash pass on a scratch copy ----
    scratch = FIX / "_scratch"
    shutil.copytree(FIX / "input", scratch)
    mapping = {m["slide"]: m["hash"] for m in MAPPING}
    for svs in sorted(scratch.iterdir()):
        if svs.name not in mapping:
            continue  # process_folder: unmapped folders are skipped
        for f in sorted(svs.glob("*.ttl.gz")):
            ok, msg = ref.update_ttl_gz_file(f, mapping[svs.name])
            print(f"{svs.name}/{f.name}: updated={ok} {msg}")

    # ---- reference loinc pass: grep -Fv over EVERY file ----
    for f in sorted(scratch.rglob("*.ttl.gz")):
        with gzip.open(f, "rt", encoding="utf-8") as fh:
            lines = fh.read().splitlines(keepends=True)
        kept = "".join(l for l in lines if LOINC_LINE not in l)
        rel = f.relative_to(scratch)
        out = GOLD / rel.parent / (rel.name.replace(".ttl.gz", ".ttl.txt"))
        out.parent.mkdir(parents=True, exist_ok=True)
        out.write_text(kept)
    shutil.rmtree(scratch)
    print(f"wrote {len(INPUTS)} inputs and goldens")


if __name__ == "__main__":
    sys.exit(main())
