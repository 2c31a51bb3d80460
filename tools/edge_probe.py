#!/usr/bin/env python3
"""Edge-corpus cross-engine probe.

Builds a scale dir that is sf0.001 with documents.parquet swapped for an
adversarial corpus (non-ASCII scripts, empty/whitespace text, multi-space
runs, single tokens, a very long doc, exact+near duplicates), runs
graft.Verify over it, and hash-compares every query against the DuckDB
oracle with check_oracle.py.

Purpose: the driver's testdata is ASCII and single-spaced, so byte-vs-
character and separator edge divergences between the Spark queries and
their DuckDB oracle SQL are invisible to the normal gate. This probe
makes them fail loudly. Usage:

    python3 tools/edge_probe.py          # builds, runs, compares
"""
import os
import shutil
import subprocess
import sys

import duckdb

SRC = "/root/testdata/sf0.001"
SF = "/tmp/edge_sf"
OUT = "/tmp/edge_out"

DOCS = [
    # doc_id, text, lang, source
    (0, "the quick brown fox jumps over the lazy dog again and again", "en", "src0"),
    (1, "héllo wörld ümlaut tokens naïve façade résumé déjà vu encore une fois", "fr", "src0"),
    (2, "数据 处理 引擎 测试 语料 多字节 字符 边界 情况 覆盖 验证 完整", "zh", "src1"),
    (3, "переработка данных поток таблица запрос система проверка юникод",
     "ru", "src1"),
    (4, "", "en", "src2"),                       # empty text
    (5, " ", "en", "src2"),                      # whitespace only -> ["", ""]
    (6, "a  b   c", "en", "src2"),               # multi-space runs -> empty tokens
    (7, "single", "en", "src2"),                 # one token, shorter than shingle len
    (8, "ab", "en", "src2"),                     # shorter than any n-gram
    (9, "the quick brown fox jumps over the lazy dog again and again", "en", "src3"),  # exact dup of 0
    (10, "the quick brown fox jumps over the lazy dog again and again today", "en", "src3"),  # near dup
    (11, " ".join(f"tok{i % 97} wörd{i % 53}" for i in range(400)), "de", "src3"),  # long doc, mixed ascii/nonascii
    (12, "emoji 🚀 test 🎉 multibyte 🌍 beyond bmp 𝒳 𝒴 𝒵 done", "en", "src4"),  # surrogate pairs
    (13, "tab\tseparated and spaced  mix", "en", "src4"),  # tab is NOT a split separator
]


def build():
    if os.path.exists(SF):
        shutil.rmtree(SF)
    os.makedirs(SF)
    for f in os.listdir(SRC):
        if f != "documents.parquet":
            shutil.copy(os.path.join(SRC, f), os.path.join(SF, f))
    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR, lang VARCHAR, source VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?, ?, ?)", DOCS)
    # n_chars mirrors the driver's column: character count of text
    con.execute(
        "COPY (SELECT doc_id, text, lang, source, length(text)::BIGINT AS n_chars "
        f"FROM docs ORDER BY doc_id) TO '{SF}/documents.parquet' (FORMAT PARQUET)")
    print(f"built {SF} with {len(DOCS)} adversarial docs")


def main():
    build()
    if os.path.exists(OUT):
        shutil.rmtree(OUT)
    r = subprocess.run(
        ["sbt", "-batch", f"runMain graft.Verify {SF} {OUT}"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        capture_output=True, text=True)
    if r.returncode != 0:
        print(r.stdout[-4000:])
        print(r.stderr[-2000:])
        sys.exit("Verify failed on the edge corpus")
    chk = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                      "check_oracle.py"), OUT, SF])
    sys.exit(chk.returncode)


if __name__ == "__main__":
    main()
