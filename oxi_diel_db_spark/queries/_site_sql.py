"""Relational SQL builders for the exact-tessellation site
featurizers (shared by queries/site_exact.py and the ml10/ml12
descriptor oracles in queries/reference_parity.py — a neutral home so
neither imports the other).

See operators/voronoi_exact.py and operators/op_fingerprint.py for the
kernel twins; every float expression here mirrors those kernels (the
repo's cross-engine hash convention).
"""

from __future__ import annotations


def _cramer_sql(p1: str, p2: str, p3: str) -> str:
    """Shared Cramer fragment: det/c1..c3/px..pz select expressions for
    three plane aliases — the same canonical cofactor order as
    operators/voronoi_exact._solve_triples."""
    return f"""
             {p2}.ny * {p3}.nz - {p2}.nz * {p3}.ny AS c1,
             {p2}.nx * {p3}.nz - {p2}.nz * {p3}.nx AS c2,
             {p2}.nx * {p3}.ny - {p2}.ny * {p3}.nx AS c3,
             {p1}.dh AS b1, {p2}.dh AS b2, {p3}.dh AS b3,
             {p1}.nx AS n1x, {p1}.ny AS n1y, {p1}.nz AS n1z,
             {p2}.nx AS n2x, {p2}.nz AS n2z, {p3}.nx AS n3x,
             {p2}.ny AS n2y, {p3}.ny AS n3y, {p3}.nz AS n3z
    """


_CRAMER_PXYZ = """
             (b1 * c1
              - n1y * (b2 * n3z - n2z * b3)
              + n1z * (b2 * n3y - n2y * b3)) / det AS px,
             (n1x * (b2 * n3z - n2z * b3)
              - b1 * c2
              + n1z * (n2x * b3 - b2 * n3x)) / det AS py,
             (n1x * (n2y * b3 - b2 * n3y)
              - n1y * (n2x * b3 - b2 * n3x)
              + b1 * c3) / det AS pz
"""



def vor_site_ctes(mat_rel: str) -> str:
    """WITH-chain (no leading WITH) ending in ``vor_site``:
    (mp_id, i, n_faces, symw4, area_min, area_max, area_std, dist_min,
    dist_mean, dist_std, vol_max, vol_sum, omega_sum) — the DuckDB
    twin of operators/voronoi_exact.voronoi_fingerprint_sites.

    Engineering notes (all measured on the gated fixture): every join
    below the pair stage uses a dense integer site key ``sid`` (string
    mp_id keys in the 100M-row triple joins were the bottleneck);
    small multi-referenced relations are MATERIALIZED (inline CTEs
    recompute per reference — the face tail references vord three
    times, which compounds exponentially), while the wide triple
    streams stay inline so they pipeline instead of buffering."""
    return f"""
    vlat AS MATERIALIZED (
      SELECT mp_id,
             structure.lattice.matrix[1][1] AS a1x,
             structure.lattice.matrix[1][2] AS a1y,
             structure.lattice.matrix[1][3] AS a1z,
             structure.lattice.matrix[2][1] AS a2x,
             structure.lattice.matrix[2][2] AS a2y,
             structure.lattice.matrix[2][3] AS a2z,
             structure.lattice.matrix[3][1] AS a3x,
             structure.lattice.matrix[3][2] AS a3y,
             structure.lattice.matrix[3][3] AS a3z
      FROM {mat_rel}
    ),
    vlat3 AS MATERIALIZED (
      SELECT *,
             vvol / sqrt(((a2y * a3z - a2z * a3y) * (a2y * a3z - a2z * a3y)
                 + (a2z * a3x - a2x * a3z) * (a2z * a3x - a2x * a3z))
                 + (a2x * a3y - a2y * a3x) * (a2x * a3y - a2y * a3x)) AS h1,
             vvol / sqrt(((a1y * a3z - a1z * a3y) * (a1y * a3z - a1z * a3y)
                 + (a1z * a3x - a1x * a3z) * (a1z * a3x - a1x * a3z))
                 + (a1x * a3y - a1y * a3x) * (a1x * a3y - a1y * a3x)) AS h2,
             vvol / sqrt(((a1y * a2z - a1z * a2y) * (a1y * a2z - a1z * a2y)
                 + (a1z * a2x - a1x * a2z) * (a1z * a2x - a1x * a2z))
                 + (a1x * a2y - a1y * a2x) * (a1x * a2y - a1y * a2x)) AS h3
      FROM (SELECT *,
              abs(a1x * (a2y * a3z - a2z * a3y)
                - a1y * (a2x * a3z - a2z * a3x)
                + a1z * (a2x * a3y - a2y * a3x)) AS vvol
            FROM vlat)
    ),
    vsites AS MATERIALIZED (
      SELECT ROW_NUMBER() OVER (ORDER BY mp_id, i) AS sid, *
      FROM (
        SELECT mp_id, t.idx AS i,
               structure.sites[t.idx].abc[1] AS fa,
               structure.sites[t.idx].abc[2] AS fb,
               structure.sites[t.idx].abc[3] AS fc
        FROM {mat_rel},
             UNNEST(range(1, len(structure.sites) + 1)) AS t(idx)
      )
    ),
    voff AS (SELECT UNNEST(range(-9, 10)) AS o),
    -- fixed ±9 offset table crossed per axis with the kernel's exact
    -- membership rule |(fj + o) − fi|·h ≤ cutoff applied stepwise
    -- (covers every cell height ≥ 1.25 Å; corpus min 2.33, pytest).
    vcand AS MATERIALIZED (
      SELECT sid, j, sqrt(dsq) AS d, vx, vy, vz,
             ROW_NUMBER() OVER w AS pid,
             COUNT(*) OVER (PARTITION BY sid) AS cnt
      FROM (
        SELECT c.*, (vx * vx + vy * vy) + vz * vz AS dsq
        FROM (
          SELECT p.sid, p.j, p.oa, p.ob, p.oc,
                 (p.dfa * p.a1x + p.dfb * p.a2x) + p.dfc * p.a3x AS vx,
                 (p.dfa * p.a1y + p.dfb * p.a2y) + p.dfc * p.a3y AS vy,
                 (p.dfa * p.a1z + p.dfb * p.a2z) + p.dfc * p.a3z AS vz
          FROM (
            SELECT p.*, f.o AS oc, (p.fcj + f.o) - p.fci AS dfc
            FROM (
              SELECT p.*, f.o AS ob, (p.fbj + f.o) - p.fbi AS dfb
              FROM (
                SELECT p.*, f.o AS oa, (p.faj + f.o) - p.fai AS dfa
                FROM (
                  SELECT a.sid, b.sid AS j,
                         a.fa AS fai, a.fb AS fbi, a.fc AS fci,
                         b.fa AS faj, b.fb AS fbj, b.fc AS fcj,
                         l.a1x, l.a1y, l.a1z, l.a2x, l.a2y, l.a2z,
                         l.a3x, l.a3y, l.a3z, l.h1, l.h2, l.h3
                  FROM vsites a
                  JOIN vsites b ON a.mp_id = b.mp_id
                  JOIN vlat3 l ON l.mp_id = a.mp_id
                ) p, voff f
                WHERE abs((p.faj + f.o) - p.fai) * p.h1 <= 10.0
              ) p, voff f
              WHERE abs((p.fbj + f.o) - p.fbi) * p.h2 <= 10.0
            ) p, voff f
            WHERE abs((p.fcj + f.o) - p.fci) * p.h3 <= 10.0
          ) p
        ) c
        WHERE (vx * vx + vy * vy) + vz * vz > 1e-12
          AND (vx * vx + vy * vy) + vz * vz <= 100.0
      )
      WINDOW w AS (PARTITION BY sid ORDER BY dsq, j, oa, ob, oc)
    ),
    vplane AS MATERIALIZED (
      SELECT sid, pid, d, vx / d AS nx, vy / d AS ny, vz / d AS nz,
             d * 0.5 AS dh
      FROM vcand
    ),
    vpa AS MATERIALIZED (
      SELECT p.sid, p.pid, p.nx, p.ny, p.nz, p.dh
      FROM vplane p
      JOIN (SELECT sid, MAX(CASE WHEN pid = LEAST(32, cnt) THEN d END)
                     AS dk
            FROM vcand GROUP BY sid) k ON k.sid = p.sid
      WHERE p.d <= k.dk + 1e-9
      UNION ALL
      SELECT s.sid, 1000000 + ax.pid AS pid,
             ax.sgn * (CASE ax.axk WHEN 1 THEN l.a1x WHEN 2 THEN l.a2x
                                   ELSE l.a3x END) / ax_len AS nx,
             ax.sgn * (CASE ax.axk WHEN 1 THEN l.a1y WHEN 2 THEN l.a2y
                                   ELSE l.a3y END) / ax_len AS ny,
             ax.sgn * (CASE ax.axk WHEN 1 THEN l.a1z WHEN 2 THEN l.a2z
                                   ELSE l.a3z END) / ax_len AS nz,
             ax_len * 0.5 AS dh
      FROM vsites s
      JOIN vlat3 l ON l.mp_id = s.mp_id,
      (VALUES (1, 1, 1.0), (2, 2, 1.0), (3, 3, 1.0),
              (4, 1, -1.0), (5, 2, -1.0), (6, 3, -1.0))
        AS ax(pid, axk, sgn),
      LATERAL (SELECT CASE ax.axk
                 WHEN 1 THEN sqrt((l.a1x * l.a1x + l.a1y * l.a1y)
                                  + l.a1z * l.a1z)
                 WHEN 2 THEN sqrt((l.a2x * l.a2x + l.a2y * l.a2y)
                                  + l.a2z * l.a2z)
                 ELSE sqrt((l.a3x * l.a3x + l.a3y * l.a3y)
                           + l.a3z * l.a3z) END AS ax_len) AS ln
    ),
    -- stage-A vertices: NOT EXISTS gives the inside test an early-out
    -- per violating plane (a BOOL_AND group-by evaluated every plane
    -- for every candidate — measured 5x slower)
    vrb AS MATERIALIZED (
      SELECT t.sid, sqrt(MAX(t.r2)) AS rb
      FROM (
        SELECT sid, px, py, pz, (px * px + py * py) + pz * pz AS r2
        FROM (
          SELECT sid, {_CRAMER_PXYZ}
          FROM (SELECT *, n1x * c1 - n1y * c2 + n1z * c3 AS det
                FROM (
                  SELECT p1.sid,
                         {_cramer_sql("p1", "p2", "p3")}
                  FROM vpa p1
                  JOIN vpa p2 ON p2.sid = p1.sid AND p2.pid > p1.pid
                  JOIN vpa p3 ON p3.sid = p1.sid AND p3.pid > p2.pid
                ))
          WHERE abs(det) > 1e-10
        )
        WHERE (px * px + py * py) + pz * pz
              <= (5.0 + 1e-6) * (5.0 + 1e-6)
      ) t
      WHERE NOT EXISTS (
        SELECT 1 FROM vpa p
        WHERE p.sid = t.sid
          AND ((t.px * p.nx + t.py * p.ny) + t.pz * p.nz) > p.dh + 1e-6
      )
      GROUP BY t.sid
    ),
    vpb AS MATERIALIZED (
      SELECT p.sid, p.pid, p.nx, p.ny, p.nz, p.dh, p.d, r.rb AS rhat
      FROM vplane p JOIN vrb r ON r.sid = p.sid
      WHERE p.d <= 2.0 * r.rb + 1e-6
    ),
    vvb AS MATERIALIZED (
      SELECT t.sid, t.t1, t.t2, t.t3, t.px, t.py, t.pz
      FROM (
        SELECT * FROM (
          SELECT sid, rhat, t1, t2, t3, {_CRAMER_PXYZ}
          FROM (SELECT *, n1x * c1 - n1y * c2 + n1z * c3 AS det
                FROM (
                  SELECT p1.sid, p1.rhat,
                         p1.pid AS t1, p2.pid AS t2, p3.pid AS t3,
                         {_cramer_sql("p1", "p2", "p3")}
                  FROM vpb p1
                  JOIN vpb p2 ON p2.sid = p1.sid AND p2.pid > p1.pid
                  JOIN vpb p3 ON p3.sid = p1.sid AND p3.pid > p2.pid
                ))
          WHERE abs(det) > 1e-10
        )
        WHERE (px * px + py * py) + pz * pz
              <= (rhat + 1e-6) * (rhat + 1e-6)
      ) t
      WHERE NOT EXISTS (
        SELECT 1 FROM vpb p
        WHERE p.sid = t.sid
          AND ((t.px * p.nx + t.py * p.ny) + t.pz * p.nz) > p.dh + 1e-6
      )
    ),
    vmem AS MATERIALIZED (
      SELECT sid, p, t1, t2, t3, px, py, pz
      FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY sid, p,
                       round(px + 1e-9, 5), round(py + 1e-9, 5),
                       round(pz + 1e-9, 5)
          ORDER BY t1, t2, t3) AS rn
        FROM (
          SELECT sid, t1 AS p, t1, t2, t3, px, py, pz FROM vvb
          UNION ALL
          SELECT sid, t2 AS p, t1, t2, t3, px, py, pz FROM vvb
          UNION ALL
          SELECT sid, t3 AS p, t1, t2, t3, px, py, pz FROM vvb
        )
      ) WHERE rn = 1
    ),
    vbasis2 AS MATERIALIZED (
      SELECT *,
             ny * e1z - nz * e1y AS e2x,
             nz * e1x - nx * e1z AS e2y,
             nx * e1y - ny * e1x AS e2z
      FROM (
        SELECT f.sid, f.p, f.nv, f.cx, f.cy, f.cz,
               pl.nx, pl.ny, pl.nz, pl.dh, pl.d,
               (a.px - f.cx)
                 / sqrt(((a.px - f.cx) * (a.px - f.cx)
                         + (a.py - f.cy) * (a.py - f.cy))
                        + (a.pz - f.cz) * (a.pz - f.cz)) AS e1x,
               (a.py - f.cy)
                 / sqrt(((a.px - f.cx) * (a.px - f.cx)
                         + (a.py - f.cy) * (a.py - f.cy))
                        + (a.pz - f.cz) * (a.pz - f.cz)) AS e1y,
               (a.pz - f.cz)
                 / sqrt(((a.px - f.cx) * (a.px - f.cx)
                         + (a.py - f.cy) * (a.py - f.cy))
                        + (a.pz - f.cz) * (a.pz - f.cz)) AS e1z
        FROM (
          SELECT sid, p, COUNT(*) AS nv,
                 AVG(px) AS cx, AVG(py) AS cy, AVG(pz) AS cz
          FROM vmem GROUP BY sid, p
          HAVING COUNT(*) >= 3
        ) f
        JOIN (
          SELECT sid, p, px, py, pz
          FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY sid, p
                                         ORDER BY t1, t2, t3) AS rn
            FROM vmem
          ) WHERE rn = 1
        ) a ON a.sid = f.sid AND a.p = f.p
        JOIN vpb pl ON pl.sid = f.sid AND pl.pid = f.p
      )
    ),
    vord AS MATERIALIZED (
      SELECT m.sid, m.p, b.nv, b.dh, b.d, m.px, m.py, m.pz,
             ROW_NUMBER() OVER (
               PARTITION BY m.sid, m.p
               ORDER BY atan2(
                 ((m.px - b.cx) * b.e2x + (m.py - b.cy) * b.e2y)
                   + (m.pz - b.cz) * b.e2z,
                 ((m.px - b.cx) * b.e1x + (m.py - b.cy) * b.e1y)
                   + (m.pz - b.cz) * b.e1z)) AS seq
      FROM vmem m
      JOIN vbasis2 b ON b.sid = m.sid AND b.p = m.p
    ),
    vface AS MATERIALIZED (
      SELECT sid, p, ANY_VALUE(nv) AS nv, ANY_VALUE(d) AS d,
             0.5 * SUM(crn) AS area,
             0.5 * SUM(crn) * ANY_VALUE(dh) / 3.0 AS vol,
             SUM(abs(2.0 * atan2(tau,
               ((la * lb * lc + dab * lc) + dac * lb) + dbc * la)))
               AS omega
      FROM (
        SELECT sid, p, nv, dh, d,
             sqrt((((vby - vay) * (vcz - vaz) - (vbz - vaz) * (vcy - vay))
                   * ((vby - vay) * (vcz - vaz) - (vbz - vaz) * (vcy - vay))
                   + ((vbz - vaz) * (vcx - vax) - (vbx - vax) * (vcz - vaz))
                   * ((vbz - vaz) * (vcx - vax) - (vbx - vax) * (vcz - vaz)))
                  + ((vbx - vax) * (vcy - vay) - (vby - vay) * (vcx - vax))
                  * ((vbx - vax) * (vcy - vay) - (vby - vay) * (vcx - vax))
             ) AS crn,
             (vax * (vby * vcz - vbz * vcy)
              + vay * (vbz * vcx - vbx * vcz))
              + vaz * (vbx * vcy - vby * vcx) AS tau,
             sqrt((vax * vax + vay * vay) + vaz * vaz) AS la,
             sqrt((vbx * vbx + vby * vby) + vbz * vbz) AS lb,
             sqrt((vcx * vcx + vcy * vcy) + vcz * vcz) AS lc,
             (vax * vbx + vay * vby) + vaz * vbz AS dab,
             (vax * vcx + vay * vcy) + vaz * vcz AS dac,
             (vbx * vcx + vby * vcy) + vbz * vcz AS dbc
        FROM (
          SELECT o.sid, o.p, o.nv, o.dh, o.d,
                 v1.px AS vax, v1.py AS vay, v1.pz AS vaz,
                 o.px AS vbx, o.py AS vby, o.pz AS vbz,
                 n2.px AS vcx, n2.py AS vcy, n2.pz AS vcz
          FROM vord o
          JOIN vord n2 ON n2.sid = o.sid AND n2.p = o.p
                      AND n2.seq = o.seq + 1
          JOIN vord v1 ON v1.sid = o.sid AND v1.p = o.p
                      AND v1.seq = 1
          WHERE o.seq >= 2
        )
      ) GROUP BY sid, p
    ),
    vor_site AS (
      SELECT s.mp_id, s.i, v.* EXCLUDE (sid)
      FROM (
        SELECT sid, COUNT(*) AS n_faces,
               CASE WHEN COALESCE(SUM(omega)
                      FILTER (WHERE nv BETWEEN 3 AND 10), 0) > 0
                    THEN COALESCE(SUM(omega) FILTER (WHERE nv = 4), 0)
                         / (SUM(omega) FILTER (WHERE nv BETWEEN 3 AND 10))
               END AS symw4,
               MIN(area) AS area_min, MAX(area) AS area_max,
               STDDEV_POP(area) AS area_std,
               MIN(d) AS dist_min, AVG(d) AS dist_mean,
               STDDEV_POP(d) AS dist_std,
               MAX(vol) AS vol_max, SUM(vol) AS vol_sum,
               SUM(omega) AS omega_sum
        FROM vface GROUP BY sid
      ) v JOIN vsites s ON s.sid = v.sid
    )"""



def _gauss_pair_sql(motif: str) -> str:
    """max over the motif's target angles of the Gaussian kernel, as
    SQL over a pair's cos(θ) column ``cost`` — mirrors _gauss_kernel."""
    from oxi_diel_db_spark.operators.op_fingerprint import (
        MOTIF_TARGETS,
        SIGMA,
    )

    th = "acos(LEAST(GREATEST(cost, -1.0), 1.0))"
    # float() before !r: SIGMA / the targets are numpy.float64, whose
    # repr under numpy >= 2.0 is 'np.float64(...)' — invalid SQL.
    sig = repr(float(SIGMA))
    terms = [
        f"exp(-0.5 * (({th} - {float(t)!r}) / {sig})"
        f" * (({th} - {float(t)!r}) / {sig}))"
        for t in MOTIF_TARGETS[motif]
    ]
    if len(terms) == 1:
        return terms[0]
    return "GREATEST(" + ", ".join(terms) + ")"



def opsf_site_ctes(mat_rel: str) -> str:
    """WITH-chain (no leading WITH) ending in ``opsf_site``:
    (mp_id, i, sgl_bd, lin, bent150, tri_plan, pent_plan, oct,
    seesaw, tet, q6) — the DuckDB twin of
    operators/op_fingerprint.op_fingerprint_sites."""
    from oxi_diel_db_spark.operators.op_fingerprint import DRS

    drs_values = ", ".join(f"({v!r})" for v in DRS)
    gauss_cols = "".join(
        f"""
             SUM({_gauss_pair_sql(m)}) / COUNT(*) AS q_{m},"""
        for m in ("lin", "bent150", "tri_plan", "pent_plan", "oct",
                  "seesaw")
    )
    return f"""
    osites AS MATERIALIZED (
      SELECT ROW_NUMBER() OVER (ORDER BY mp_id, i) AS sid, *
      FROM (
        SELECT mp_id, t.idx AS i,
               structure.sites[t.idx].abc[1] AS fa,
               structure.sites[t.idx].abc[2] AS fb,
               structure.sites[t.idx].abc[3] AS fc
        FROM {mat_rel},
             UNNEST(range(1, len(structure.sites) + 1)) AS t(idx)
      )
    ),
    olat AS MATERIALIZED (
      SELECT *,
             vvol / sqrt(((a2y * a3z - a2z * a3y) * (a2y * a3z - a2z * a3y)
                 + (a2z * a3x - a2x * a3z) * (a2z * a3x - a2x * a3z))
                 + (a2x * a3y - a2y * a3x) * (a2x * a3y - a2y * a3x)) AS h1,
             vvol / sqrt(((a1y * a3z - a1z * a3y) * (a1y * a3z - a1z * a3y)
                 + (a1z * a3x - a1x * a3z) * (a1z * a3x - a1x * a3z))
                 + (a1x * a3y - a1y * a3x) * (a1x * a3y - a1y * a3x)) AS h2,
             vvol / sqrt(((a1y * a2z - a1z * a2y) * (a1y * a2z - a1z * a2y)
                 + (a1z * a2x - a1x * a2z) * (a1z * a2x - a1x * a2z))
                 + (a1x * a2y - a1y * a2x) * (a1x * a2y - a1y * a2x)) AS h3
      FROM (
        SELECT *,
               abs(a1x * (a2y * a3z - a2z * a3y)
                 - a1y * (a2x * a3z - a2z * a3x)
                 + a1z * (a2x * a3y - a2y * a3x)) AS vvol
        FROM (
          SELECT mp_id,
                 structure.lattice.matrix[1][1] AS a1x,
                 structure.lattice.matrix[1][2] AS a1y,
                 structure.lattice.matrix[1][3] AS a1z,
                 structure.lattice.matrix[2][1] AS a2x,
                 structure.lattice.matrix[2][2] AS a2y,
                 structure.lattice.matrix[2][3] AS a2z,
                 structure.lattice.matrix[3][1] AS a3x,
                 structure.lattice.matrix[3][2] AS a3y,
                 structure.lattice.matrix[3][3] AS a3z
          FROM {mat_rel})
      )
    ),
    ooff AS (SELECT UNNEST(range(-9, 10)) AS o),
    ocand AS MATERIALIZED (
      SELECT sid, sqrt(dsq) AS d, vx, vy, vz,
             ROW_NUMBER() OVER (PARTITION BY sid
                                ORDER BY dsq, j, oa, ob, oc) AS rnk
      FROM (
        SELECT c.*, (vx * vx + vy * vy) + vz * vz AS dsq
        FROM (
          SELECT p.sid, p.j, p.oa, p.ob, p.oc,
                 (p.dfa * p.a1x + p.dfb * p.a2x) + p.dfc * p.a3x AS vx,
                 (p.dfa * p.a1y + p.dfb * p.a2y) + p.dfc * p.a3y AS vy,
                 (p.dfa * p.a1z + p.dfb * p.a2z) + p.dfc * p.a3z AS vz
          FROM (
            SELECT p.*, f.o AS oc, (p.fcj + f.o) - p.fci AS dfc
            FROM (
              SELECT p.*, f.o AS ob, (p.fbj + f.o) - p.fbi AS dfb
              FROM (
                SELECT p.*, f.o AS oa, (p.faj + f.o) - p.fai AS dfa
                FROM (
                  SELECT a.sid, b.sid AS j,
                         a.fa AS fai, a.fb AS fbi, a.fc AS fci,
                         b.fa AS faj, b.fb AS fbj, b.fc AS fcj,
                         l.a1x, l.a1y, l.a1z, l.a2x, l.a2y, l.a2z,
                         l.a3x, l.a3y, l.a3z, l.h1, l.h2, l.h3
                  FROM osites a
                  JOIN osites b ON a.mp_id = b.mp_id
                  JOIN olat l ON l.mp_id = a.mp_id
                ) p, ooff f
                WHERE abs((p.faj + f.o) - p.fai) * p.h1 <= 12.0
              ) p, ooff f
              WHERE abs((p.fbj + f.o) - p.fbi) * p.h2 <= 12.0
            ) p, ooff f
            WHERE abs((p.fcj + f.o) - p.fci) * p.h3 <= 12.0
          ) p
        ) c
        WHERE (vx * vx + vy * vy) + vz * vz > 1e-12
          AND (vx * vx + vy * vy) + vz * vz <= 144.0
      )
    ),
    ocut AS MATERIALIZED (
      SELECT sid,
             GREATEST(6.0, ceil(MAX(CASE WHEN rnk = 12 THEN d END)))
               AS rcut,
             MAX(CASE WHEN rnk = 1 THEN d END) AS d1,
             MAX(CASE WHEN rnk = 2 THEN d END) AS d2
      FROM ocand GROUP BY sid
    ),
    onbr AS MATERIALIZED (
      SELECT c.sid, c.rnk, c.d, c.d / k.d1 AS drel,
             c.vx / c.d AS ux, c.vy / c.d AS uy, c.vz / c.d AS uz
      FROM ocand c JOIN ocut k ON k.sid = c.sid
      WHERE c.d <= k.rcut
    ),
    obin AS MATERIALIZED (
      SELECT n.*, v.dr,
             (floor(n.drel / v.dr + 0.5) + 0.5) * v.dr AS dbin
      FROM onbr n, (VALUES {drs_values}) AS v(dr)
    ),
    oshell AS MATERIALIZED (
      SELECT sid, dr, dbin,
             CAST(SUM(cnt) OVER w AS INTEGER) AS cn,
             SUM(inv_sum) OVER w AS inv_cum
      FROM (SELECT sid, dr, dbin, COUNT(*) AS cnt,
                   SUM(1.0 / drel) AS inv_sum
            FROM obin GROUP BY sid, dr, dbin)
      WINDOW w AS (PARTITION BY sid, dr ORDER BY dbin)
    ),
    oprefix AS MATERIALIZED (
      SELECT sid, dr, dbin, cn,
             (inv_cum / cn) * (inv_cum / cn) AS dfac
      FROM oshell WHERE cn IN (2, 3, 4, 5, 6, 12)
    ),
    opair AS (
      SELECT s.sid, s.dr, s.cn, s.dfac,
             (n1.ux * n2.ux + n1.uy * n2.uy) + n1.uz * n2.uz AS cost
      FROM oprefix s
      JOIN obin n1 ON n1.sid = s.sid AND n1.dr = s.dr
                  AND n1.dbin <= s.dbin
      JOIN obin n2 ON n2.sid = s.sid AND n2.dr = s.dr
                  AND n2.dbin <= s.dbin AND n2.rnk > n1.rnk
    ),
    omotif AS MATERIALIZED (
      SELECT sid, dr, cn, ANY_VALUE(dfac) AS dfac,{gauss_cols}
             1.0 - 0.375 * SUM((cost + (1.0 / 3.0))
                               * (cost + (1.0 / 3.0))) AS q_tet
      FROM opair GROUP BY sid, dr, cn
    ),
    oq6 AS MATERIALIZED (
      SELECT s.sid, s.dr, ANY_VALUE(s.dfac) AS dfac,
             sqrt(GREATEST(SUM(
               ((231.0 * c2 * c2 * c2 - 315.0 * c2 * c2)
                + 105.0 * c2 - 5.0) / 16.0) / (144.0), 0.0)) AS q6
      FROM (
        SELECT s.sid, s.dr, s.dfac,
               ((n1.ux * n2.ux + n1.uy * n2.uy) + n1.uz * n2.uz)
               * ((n1.ux * n2.ux + n1.uy * n2.uy) + n1.uz * n2.uz) AS c2
        FROM (SELECT * FROM oprefix WHERE cn = 12) s
        JOIN obin n1 ON n1.sid = s.sid AND n1.dr = s.dr
                    AND n1.dbin <= s.dbin
        JOIN obin n2 ON n2.sid = s.sid AND n2.dr = s.dr
                    AND n2.dbin <= s.dbin
      ) s GROUP BY s.sid, s.dr
    ),
    ovariant AS MATERIALIZED (
      SELECT v.sid, v.dr,
             COALESCE(m2.dfac * m2.q_lin, 0.0) AS lin,
             COALESCE(m2.dfac * m2.q_bent150, 0.0) AS bent150,
             COALESCE(m3.dfac * m3.q_tri_plan, 0.0) AS tri_plan,
             COALESCE(m5.dfac * m5.q_pent_plan, 0.0) AS pent_plan,
             COALESCE(m6.dfac * m6.q_oct, 0.0) AS oct,
             COALESCE(m4.dfac * m4.q_seesaw, 0.0) AS seesaw,
             COALESCE(m4.dfac * m4.q_tet, 0.0) AS tet,
             COALESCE(q.dfac * q.q6, 0.0) AS q6
      FROM (SELECT DISTINCT sid, dr FROM obin) v
      LEFT JOIN omotif m2 ON m2.sid = v.sid AND m2.dr = v.dr
                         AND m2.cn = 2
      LEFT JOIN omotif m3 ON m3.sid = v.sid AND m3.dr = v.dr
                         AND m3.cn = 3
      LEFT JOIN omotif m4 ON m4.sid = v.sid AND m4.dr = v.dr
                         AND m4.cn = 4
      LEFT JOIN omotif m5 ON m5.sid = v.sid AND m5.dr = v.dr
                         AND m5.cn = 5
      LEFT JOIN omotif m6 ON m6.sid = v.sid AND m6.dr = v.dr
                         AND m6.cn = 6
      LEFT JOIN oq6 q ON q.sid = v.sid AND q.dr = v.dr
    ),
    opsf_site AS (
      SELECT s.mp_id, s.i,
             1.0 - k.d1 / k.d2 AS sgl_bd,
             a.lin, a.bent150, a.tri_plan, a.pent_plan,
             a.oct, a.seesaw, a.tet, a.q6
      FROM (
        SELECT sid, MEDIAN(lin) AS lin, MEDIAN(bent150) AS bent150,
               MEDIAN(tri_plan) AS tri_plan,
               MEDIAN(pent_plan) AS pent_plan, MEDIAN(oct) AS oct,
               MEDIAN(seesaw) AS seesaw, MEDIAN(tet) AS tet,
               MEDIAN(q6) AS q6
        FROM ovariant GROUP BY sid
      ) a
      JOIN ocut k ON k.sid = a.sid
      JOIN osites s ON s.sid = a.sid
    )"""


