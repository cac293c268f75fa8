#!/usr/bin/env python3
"""Generate the committed q98 shapefile fixture pair (deterministic):

- data/features_lonlat.csv   geographic twin: (fid, seq, x, y) closed
                             rings in lon/lat — the DuckDB-readable side
- data/features_utm.shp/.dbf/.prj
                             the SAME polygons forward-projected to
                             WGS84 / UTM zone 13N, with the PROJCS .prj
                             — the engine must reproject them back

The forward Transverse Mercator here mirrors graft.sources.CrsTransform
(Snyder 1987 eq. 8-9..8-15) so the fixture is the exact planar image of
the twin; the engine's inverse recovers lon/lat to ~1e-9 degrees and
round6 on both sides absorbs that.
"""
import math, struct, csv, os

A = 6378137.0
INVF = 298.257223563
F = 1.0 / INVF
E2 = F * (2 - F)
EP2 = E2 / (1 - E2)
K0 = 0.9996
LAM0 = math.radians(-105.0)
FE = 500000.0

def arc_m(phi):
    e2, a = E2, A
    return a * ((1 - e2/4 - 3*e2*e2/64 - 5*e2**3/256) * phi
        - (3*e2/8 + 3*e2*e2/32 + 45*e2**3/1024) * math.sin(2*phi)
        + (15*e2*e2/256 + 45*e2**3/1024) * math.sin(4*phi)
        - (35*e2**3/3072) * math.sin(6*phi))

def fwd(lon, lat):
    phi, lam = math.radians(lat), math.radians(lon)
    sinp, cosp = math.sin(phi), math.cos(phi)
    n = A / math.sqrt(1 - E2 * sinp * sinp)
    t = (sinp / cosp) ** 2
    c = EP2 * cosp * cosp
    a_ = (lam - LAM0) * cosp
    x = K0 * n * (a_ + (1 - t + c) * a_**3 / 6
        + (5 - 18*t + t*t + 72*c - 58*EP2) * a_**5 / 120)
    y = K0 * (arc_m(phi) + n * (sinp/cosp) * (a_*a_/2
        + (5 - t + 9*c + 4*c*c) * a_**4 / 24
        + (61 - 58*t + t*t + 600*c - 330*EP2) * a_**6 / 720))
    return x + FE, y

# three single-ring polygons (closed: last == first), lon/lat, CCW
FEATS = [
    (1, [(-105.30, 39.50), (-104.60, 39.55), (-104.70, 40.20),
         (-105.25, 40.10), (-105.30, 39.50)]),
    (2, [(-106.10, 37.40), (-105.40, 37.35), (-105.45, 38.05),
         (-106.00, 38.10), (-106.10, 37.40)]),
    (3, [(-104.20, 40.90), (-103.70, 40.95), (-103.90, 41.45),
         (-104.20, 40.90)]),
]

# --- Albers Equal Area twin (Snyder eq. 14-1..14-5 + 3-12), the
# USA_Contiguous_Albers parameter shape on WGS84 ---
AEA_P1, AEA_P2, AEA_P0, AEA_L0 = (math.radians(29.5), math.radians(45.5),
                                  math.radians(23.0), math.radians(-96.0))
E = math.sqrt(E2)

def _q(phi):
    s = math.sin(phi)
    return (1 - E2) * (s / (1 - E2*s*s)
                       - (1/(2*E)) * math.log((1 - E*s)/(1 + E*s)))

def _m(phi):
    return math.cos(phi) / math.sqrt(1 - E2 * math.sin(phi)**2)

AEA_N = (_m(AEA_P1)**2 - _m(AEA_P2)**2) / (_q(AEA_P2) - _q(AEA_P1))
AEA_C = _m(AEA_P1)**2 + AEA_N * _q(AEA_P1)
AEA_RHO0 = A * math.sqrt(AEA_C - AEA_N * _q(AEA_P0)) / AEA_N

def fwd_aea(lon, lat):
    rho = A * math.sqrt(AEA_C - AEA_N * _q(math.radians(lat))) / AEA_N
    th = AEA_N * (math.radians(lon) - AEA_L0)
    return rho * math.sin(th), AEA_RHO0 - rho * math.cos(th)

AEA_PRJ = ('PROJCS["USA_Contiguous_Albers_Equal_Area_Conic",'
           'GEOGCS["WGS 84",DATUM["WGS_1984",'
           'SPHEROID["WGS 84",6378137,298.257223563]],PRIMEM["Greenwich",0],'
           'UNIT["degree",0.0174532925199433]],'
           'PROJECTION["Albers"],'
           'PARAMETER["False_Easting",0],'
           'PARAMETER["False_Northing",0],'
           'PARAMETER["Central_Meridian",-96],'
           'PARAMETER["Standard_Parallel_1",29.5],'
           'PARAMETER["Standard_Parallel_2",45.5],'
           'PARAMETER["Latitude_Of_Origin",23],UNIT["Meter",1]]')

PRJ = ('PROJCS["WGS 84 / UTM zone 13N",GEOGCS["WGS 84",DATUM["WGS_1984",'
       'SPHEROID["WGS 84",6378137,298.257223563]],PRIMEM["Greenwich",0],'
       'UNIT["degree",0.0174532925199433]],'
       'PROJECTION["Transverse_Mercator"],'
       'PARAMETER["latitude_of_origin",0],'
       'PARAMETER["central_meridian",-105],'
       'PARAMETER["scale_factor",0.9996],'
       'PARAMETER["false_easting",500000],'
       'PARAMETER["false_northing",0],UNIT["metre",1]]')

def write_shp(path, feats):
    recs = []
    for _, ring in feats:
        xs = [p[0] for p in ring]; ys = [p[1] for p in ring]
        content = struct.pack('<i', 5)
        content += struct.pack('<4d', min(xs), min(ys), max(xs), max(ys))
        content += struct.pack('<2i', 1, len(ring))
        content += struct.pack('<i', 0)
        for x, y in ring:
            content += struct.pack('<2d', x, y)
        recs.append(content)
    total = 100 + sum(8 + len(r) for r in recs)
    allx = [p[0] for _, ring in feats for p in ring]
    ally = [p[1] for _, ring in feats for p in ring]
    with open(path, 'wb') as f:
        hdr = struct.pack('>i20xi', 9994, total // 2)
        hdr += struct.pack('<2i', 1000, 5)
        hdr += struct.pack('<4d', min(allx), min(ally), max(allx), max(ally))
        hdr += b'\x00' * 32
        f.write(hdr)
        for i, r in enumerate(recs):
            f.write(struct.pack('>2i', i + 1, len(r) // 2))
            f.write(r)

def write_dbf(path, feats):
    field_len, name = 18, b'nhru_v1_1'
    header_size = 32 + 32 + 1
    record_size = 1 + field_len
    with open(path, 'wb') as f:
        hdr = bytearray(32)
        hdr[0] = 0x03
        struct.pack_into('<i', hdr, 4, len(feats))
        struct.pack_into('<h', hdr, 8, header_size)
        struct.pack_into('<h', hdr, 10, record_size)
        f.write(hdr)
        fd = bytearray(32)
        fd[0:len(name)] = name
        fd[11] = ord('N')
        fd[16] = field_len
        f.write(fd)
        f.write(b'\x0d')
        for fid, _ in feats:
            f.write(b' ' + str(fid).rjust(field_len).encode())
        f.write(b'\x1a')

def main():
    base = os.path.join(os.path.dirname(__file__), '..', 'data')
    with open(os.path.join(base, 'features_lonlat.csv'), 'w', newline='') as f:
        w = csv.writer(f)
        w.writerow(['fid', 'seq', 'x', 'y'])
        for fid, ring in FEATS:
            for i, (x, y) in enumerate(ring):
                w.writerow([fid, i + 1, x, y])
    projected = [(fid, [fwd(x, y) for x, y in ring]) for fid, ring in FEATS]
    write_shp(os.path.join(base, 'features_utm.shp'), projected)
    write_dbf(os.path.join(base, 'features_utm.dbf'), projected)
    with open(os.path.join(base, 'features_utm.prj'), 'w') as f:
        f.write(PRJ)
    aea = [(fid, [fwd_aea(x, y) for x, y in ring]) for fid, ring in FEATS]
    write_shp(os.path.join(base, 'features_aea.shp'), aea)
    write_dbf(os.path.join(base, 'features_aea.dbf'), aea)
    with open(os.path.join(base, 'features_aea.prj'), 'w') as f:
        f.write(AEA_PRJ)
    print('wrote features_lonlat.csv + features_{utm,aea}.{shp,dbf,prj}')

if __name__ == '__main__':
    main()
