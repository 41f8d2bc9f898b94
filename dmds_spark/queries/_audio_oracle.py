"""Shared DuckDB oracle fragments for the audio family (round 13).

The synthesized media payload is arithmetic in (doc_id, n_chars) —
byte j is (doc_id*31 + j*7) % 256 over L = min(w*h*3, 4096) bytes with
w = 16 + n_chars%48, h = 16 + (n_chars//7)%48 — so the PCM16
little-endian sample stream restates declaratively:

    s_t = lo + 256*hi,  lo = byte(2t), hi = byte(2t+1),
    signed: s_t - 65536 when s_t >= 32768.

Two exactness facts make the whole family SQL-expressible:

- NO sample is ever zero: lo == 0 and hi == 0 simultaneously would
  need (d*31 + 14t) ≡ 0 and (d*31 + 14t + 7) ≡ 0 (mod 256) — their
  difference is 7, never ≡ 0 — so the operator's zero-skipping
  zero-crossing definition degenerates to plain consecutive sign
  flips, a LAG per (clip, frame).
- Framing is pure index arithmetic: n = L//2 samples; n >= 400 gives
  (n-400)//160 + 1 sliding frames of 400 (hop 160), else ONE truncated
  frame of n samples — regenerated with UNNEST(range(...)), exactly
  the pHash raster trick (llm_extra14) applied to the time axis.

Everything is integer (energies are sums of squares), so the oracle
hash-matches the mapInPandas engine path bit for bit.
"""

# frames + per-frame (energy, zero-crossing) features, ending open for
# a final SELECT; yields CTE `feats(doc_id, f, energy, zc)`
AUDIO_FEATS_CTE = """
    WITH geo AS (
      SELECT doc_id,
             least((16 + n_chars % 48) * (16 + (n_chars // 7) % 48) * 3,
                   4096) AS L
      FROM documents
    ), dims AS (SELECT doc_id, L // 2 AS n FROM geo
    ), fr AS (
      SELECT doc_id, n,
             CASE WHEN n >= 400 THEN (n - 400) // 160 + 1 ELSE 1 END AS nf
      FROM dims
    ), frames AS (
      SELECT doc_id, n, f FROM fr, UNNEST(range(nf)) AS u(f)
    ), samp AS (
      SELECT doc_id, f, j,
             (doc_id * 31 + (f * 160 + j) * 14) % 256
             + 256 * ((doc_id * 31 + (f * 160 + j) * 14 + 7) % 256) AS raw
      FROM frames,
           UNNEST(range(CASE WHEN n >= 400 THEN 400 ELSE n END)) AS s(j)
    ), sg AS (
      SELECT doc_id, f, j,
             CASE WHEN raw >= 32768 THEN raw - 65536 ELSE raw END AS s
      FROM samp
    ), lagd AS (
      SELECT doc_id, f, s,
             LAG(s) OVER (PARTITION BY doc_id, f ORDER BY j) AS prev
      FROM sg
    ), feats AS (
      SELECT doc_id, f, SUM(s * s) AS energy,
             SUM(CASE WHEN prev IS NOT NULL AND (s < 0) <> (prev < 0)
                 THEN 1 ELSE 0 END) AS zc
      FROM lagd GROUP BY doc_id, f
    )
"""

AUDIO_ENERGY_SQL = AUDIO_FEATS_CTE + """
    SELECT CAST(doc_id AS BIGINT) AS media_id,
           CAST(COUNT(*) AS BIGINT) AS n_frames,
           CAST(SUM(energy) AS BIGINT) AS total_energy,
           CAST(SUM(zc) AS BIGINT) AS total_zc
    FROM feats GROUP BY doc_id
"""

# VAD: a frame is active when energy * n_frames > total_energy (exact
# integer cross-multiplication of "energy > clip mean"); consecutive
# active frames merge via the classic f - ROW_NUMBER() island key
AUDIO_VAD_SQL = AUDIO_FEATS_CTE + """
    , tot AS (
      SELECT doc_id, COUNT(*) AS nf_tot, SUM(energy) AS te
      FROM feats GROUP BY doc_id
    ), act AS (
      SELECT x.doc_id, x.f, x.energy
      FROM feats x JOIN tot t ON t.doc_id = x.doc_id
      WHERE CAST(x.energy AS HUGEINT) * t.nf_tot > t.te
    ), isl AS (
      SELECT doc_id, f, energy,
             f - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY f) AS grp
      FROM act
    ), segs AS (
      SELECT doc_id, grp, COUNT(*) AS seg_len, SUM(energy) AS seg_energy
      FROM isl GROUP BY doc_id, grp
    )
    SELECT CAST(doc_id AS BIGINT) AS media_id,
           CAST(COUNT(*) AS BIGINT) AS n_segments,
           CAST(SUM(seg_len) AS BIGINT) AS active_frames,
           CAST(MAX(seg_len) AS BIGINT) AS longest_segment,
           CAST(MAX(seg_energy) AS BIGINT) AS peak_segment_energy
    FROM segs GROUP BY doc_id ORDER BY media_id
"""

# downsample-by-2 with box prefilter: out_i = floor((s_2i + s_2i+1)/2).
# numpy's // FLOORS while DuckDB's // truncates toward zero, so the
# division runs on the +65536-shifted (non-negative) sum where the two
# agree, then shifts back by 32768.
AUDIO_RESAMPLE_SQL = """
    WITH geo AS (
      SELECT doc_id,
             least((16 + n_chars % 48) * (16 + (n_chars // 7) % 48) * 3,
                   4096) AS L
      FROM documents
    ), dims AS (SELECT doc_id, L // 2 AS n_in FROM geo
    ), pairs AS (
      SELECT doc_id, n_in, i FROM dims, UNNEST(range(n_in // 2)) AS u(i)
    ), samp AS (
      SELECT doc_id, n_in, i,
             ((doc_id * 31 + (2 * i) * 14) % 256
              + 256 * ((doc_id * 31 + (2 * i) * 14 + 7) % 256)) AS ra,
             ((doc_id * 31 + (2 * i + 1) * 14) % 256
              + 256 * ((doc_id * 31 + (2 * i + 1) * 14 + 7) % 256)) AS rb
      FROM pairs
    ), outp AS (
      SELECT doc_id, n_in,
             ((CASE WHEN ra >= 32768 THEN ra - 65536 ELSE ra END
               + CASE WHEN rb >= 32768 THEN rb - 65536 ELSE rb END
               + 65536) // 2) - 32768 AS o
      FROM samp
    )
    SELECT CAST(doc_id AS BIGINT) AS media_id,
           CAST(MAX(n_in) AS BIGINT) AS n_in,
           CAST(COUNT(*) AS BIGINT) AS n_out,
           CAST(SUM(o * o) AS BIGINT) AS out_energy
    FROM outp GROUP BY doc_id
"""
