"""Audio-container gates: AIFF/AIFF-C, Sun AU and IMA-ADPCM WAV
(operators/aiffmini.py) through the unified ``decode_audio`` dispatch.

Three verification styles, matching the codec-family discipline:

* ``q_aiff_au_roundtrip`` — PCM payloads are value-exact end to end, so
  the DuckDB oracle recomputes the sample statistics straight from the
  integer generator formula (two engines, zero shared code).
* ``q_au_g711`` — raw companded bytes ride the AU container and the
  oracle re-expands them with the same RELATIONAL G.711 arithmetic
  q_g711_decode uses for WAV: the identical bit math must agree across
  two containers and two engines.
* ``q_adpcm_roundtrip`` — the IMA nibble DP is not SQL-expressible, so
  the oracle is a constants VALUES table authored by an INDEPENDENT
  decoder built only from stdlib ``struct`` + ``audioop`` (the DVI
  reference codec); tests/test_aiff_au.py + test_oracle_coverage.py pin
  that the constants re-derive from audioop, never from aiffmini.

Scale shape (PLANS.md): per-row Arrow-batched projections over a pruned
doc_id scan + a tiny final aggregate — the embarrassingly-parallel codec
class (alpha <= 1; at 1000 executors the container work partitions
perfectly with zero shuffle beyond the rollup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vectorflow_spark.queries._core import _t, query

# ---------------------------------------------------------------------------
# q_aiff_au_roundtrip — PCM-exact containers, SQL-recomputed statistics
# ---------------------------------------------------------------------------

_PCM_SQL = """
    WITH docs AS (SELECT doc_id FROM documents WHERE doc_id % 7 = 3),
    k AS (
        SELECT doc_id, unnest(range(40 + doc_id % 23)) AS i FROM docs
    ),
    s AS (
        SELECT doc_id,
               CAST((doc_id * 31 + i * 17) % 4001 - 2000 AS BIGINT) AS val
        FROM k
    )
    SELECT doc_id,
           CASE CAST(doc_id % 4 AS INT)
                WHEN 0 THEN 'aiff' WHEN 1 THEN 'aifc_sowt'
                WHEN 2 THEN 'au_pcm16' ELSE 'aifc_fl32' END AS container,
           CAST(count(*) AS BIGINT) AS n_samples,
           CAST(sum(val) AS BIGINT) AS sum_val,
           CAST(min(val) AS BIGINT) AS min_val,
           CAST(max(val) AS BIGINT) AS max_val,
           TRUE AS meta_ok
    FROM s GROUP BY doc_id
"""


@query("q_aiff_au_roundtrip", _PCM_SQL)
def q_aiff_au_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AIFF ('NONE' big-endian), AIFF-C ('sowt' little-endian and 'fl32'
    float), and Sun AU (pcm16 big-endian) containers cycle by doc_id; the
    deterministic int16 payload survives encode -> unified decode_audio
    -> statistics EXACTLY, and DuckDB recomputes those statistics from
    the bare generator arithmetic. ``meta_ok`` additionally pins the
    decode_meta sniff (kind/sample-count/rate) for each container."""
    import pandas as pd
    from pyspark.sql.types import BooleanType, LongType, StringType, StructField, StructType

    out_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("container", StringType()),
            StructField("n_samples", LongType()),
            StructField("sum_val", LongType()),
            StructField("min_val", LongType()),
            StructField("max_val", LongType()),
            StructField("meta_ok", BooleanType()),
        ]
    )

    def roundtrip(pdfs):
        import numpy as np

        from vectorflow_spark.operators.aiffmini import encode_aiff, encode_au
        from vectorflow_spark.operators.codecs import decode_audio
        from vectorflow_spark.operators.multimodal import decode_meta

        names = {0: "aiff", 1: "aifc_sowt", 2: "au_pcm16", 3: "aifc_fl32"}
        for pdf in pdfs:
            rows = []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                n = 40 + i % 23
                s = np.array([(i * 31 + k * 17) % 4001 - 2000 for k in range(n)], dtype=np.int16)
                variant = i % 4
                if variant == 0:
                    blob = encode_aiff(s, 8000, 2, "NONE")
                elif variant == 1:
                    blob = encode_aiff(s, 8000, 2, "sowt")
                elif variant == 2:
                    blob = encode_au(s, 8000, "pcm16")
                else:
                    blob = encode_aiff(s.astype(np.float64), 8000, compression="fl32")
                dec, rate = decode_audio(blob)
                m = decode_meta(blob)
                v = dec.astype(np.int64)
                meta_ok = (
                    rate == 8000
                    and m["kind"] == "audio"
                    and m["sample_rate"] == 8000
                    and m["n_samples"] == n
                    and np.array_equal(v, s.astype(np.int64))
                )
                rows.append((i, names[variant], n, int(v.sum()), int(v.min()), int(v.max()), bool(meta_ok)))
            yield pd.DataFrame(rows, columns=out_schema.fieldNames())

    docs = (
        _t(spark, sf_dir, "documents", split=True)
        .filter(F.col("doc_id") % 7 == 3)
        .select("doc_id")
    )
    return docs.mapInPandas(roundtrip, out_schema)


# ---------------------------------------------------------------------------
# q_au_g711 — raw companded bytes in the AU container vs the relational
# G.711 expansion (the same CASE arithmetic q_g711_decode pins for WAV)
# ---------------------------------------------------------------------------

_AU_G711_SQL = """
    WITH docs AS (SELECT doc_id FROM documents WHERE doc_id % 9 = 4),
    k AS (
        SELECT doc_id, unnest(range(24 + doc_id % 13)) AS i FROM docs
    ),
    s AS (
        SELECT doc_id,
               CAST((doc_id * 11 + i * 29) % 256 AS BIGINT) AS code,
               (doc_id % 2 = 0) AS is_ulaw
        FROM k
    ),
    v AS (
        SELECT doc_id,
          CASE WHEN is_ulaw THEN
            CASE WHEN (255 - code) >= 128
                 THEN 132 - ((((255 - code) % 16) * 8 + 132) << (((255 - code) // 16) % 8))
                 ELSE ((((255 - code) % 16) * 8 + 132) << (((255 - code) // 16) % 8)) - 132 END
          ELSE
            CASE WHEN xor(code, 85) >= 128
                 THEN CASE WHEN (xor(code, 85) // 16) % 8 = 0 THEN (xor(code, 85) % 16) * 16 + 8
                           WHEN (xor(code, 85) // 16) % 8 = 1 THEN (xor(code, 85) % 16) * 16 + 264
                           ELSE ((xor(code, 85) % 16) * 16 + 264) << ((xor(code, 85) // 16) % 8 - 1) END
                 ELSE -(CASE WHEN (xor(code, 85) // 16) % 8 = 0 THEN (xor(code, 85) % 16) * 16 + 8
                             WHEN (xor(code, 85) // 16) % 8 = 1 THEN (xor(code, 85) % 16) * 16 + 264
                             ELSE ((xor(code, 85) % 16) * 16 + 264) << ((xor(code, 85) // 16) % 8 - 1) END) END
          END AS val
        FROM s
    )
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 'ulaw' ELSE 'alaw' END AS law,
           CAST(count(*) AS BIGINT) AS n_samples,
           CAST(sum(val) AS BIGINT) AS sum_val,
           CAST(min(val) AS BIGINT) AS min_val,
           CAST(max(val) AS BIGINT) AS max_val
    FROM v GROUP BY doc_id
"""


@query("q_au_g711", _AU_G711_SQL)
def q_au_g711(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G.711 bytes ride the Sun AU container (encodings 1/27 — the
    `audio/basic` wire format) through the unified decode; DuckDB
    re-expands the same companded stream with pure relational bit
    arithmetic. Identical to q_g711_decode's contract but for the second
    container, proving the table path is container-independent."""
    import pandas as pd
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    out_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("law", StringType()),
            StructField("n_samples", LongType()),
            StructField("sum_val", LongType()),
            StructField("min_val", LongType()),
            StructField("max_val", LongType()),
        ]
    )

    def decode(pdfs):
        import numpy as np

        from vectorflow_spark.operators.aiffmini import encode_au_g711_codes
        from vectorflow_spark.operators.codecs import decode_audio

        for pdf in pdfs:
            rows = []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                n = 24 + i % 13
                codes = np.array([(i * 11 + k * 29) % 256 for k in range(n)], dtype=np.uint8)
                law = "ulaw" if i % 2 == 0 else "alaw"
                samples, rate = decode_audio(encode_au_g711_codes(codes, 8000, law))
                assert rate == 8000
                v = samples.astype(np.int64)
                rows.append((i, law, n, int(v.sum()), int(v.min()), int(v.max())))
            yield pd.DataFrame(rows, columns=out_schema.fieldNames())

    docs = (
        _t(spark, sf_dir, "documents", split=True)
        .filter(F.col("doc_id") % 9 == 4)
        .select("doc_id")
    )
    return docs.mapInPandas(decode, out_schema)


# ---------------------------------------------------------------------------
# q_adpcm_roundtrip — constants oracle authored by stdlib audioop
# ---------------------------------------------------------------------------
#
# Expected per-doc statistics of decode(encode_wav_ima_adpcm(samples)),
# authored by an INDEPENDENT WAV-IMA decoder built only from struct +
# audioop.adpcm2lin (nibble-swap per block, audioop seeded with each
# block header's (predictor, index)); generator:
#   n   = 64 + (doc_id % 41)
#   s_k = (((doc_id + 3) * (k*k + 7*k + 1)) % 6007) - 3003,  int16
#   encode_wav_ima_adpcm(s, 8000, block_frames=33)
# Tuple = (doc_id, n_samples, sum_val, min_val, max_val, first_val,
# last_val).  tests/test_oracle_coverage.py re-derives this table from
# audioop on every run, so a silent codec change fails loudly here.

_ADPCM_EXPECTED = (
    (0, 64, -31453, -3000, 2908, -3000, -1596), (1, 65, -21738, -2999, 2901, -2999, -208),
    (2, 66, -19139, -2998, 2929, -2998, 2349), (3, 67, -15783, -2997, 2895, -2997, 1883),
    (4, 68, -10567, -2996, 2971, -2996, 1198), (5, 69, -7638, -2995, 3131, -2995, 1670),
    (6, 70, -8731, -2994, 2914, -2994, 2473), (7, 71, -4516, -2993, 3016, -2993, 2858),
    (8, 72, -8716, -2992, 2909, -2992, -1702), (9, 73, -15865, -3342, 2871, -2991, -772),
    (10, 74, -6388, -2990, 3052, -2990, 411), (11, 75, -1016, -2989, 3005, -2989, 2382),
    (12, 76, -18158, -3274, 3044, -2988, -645), (13, 77, -4031, -2987, 3193, -2987, 1580),
    (14, 78, -14677, -2986, 3017, -2986, -1448), (15, 79, -5106, -2985, 3008, -2985, 2372),
    (16, 80, -13318, -2984, 3114, -2984, -152), (17, 81, 602, -3308, 3229, -2983, -1942),
    (18, 82, -2265, -3076, 2991, -2982, 2991), (19, 83, -7357, -2981, 2988, -2981, 1358),
    (20, 84, -610, -2980, 3001, -2980, 1139), (21, 85, -3290, -2979, 3459, -2979, 442),
    (22, 86, -2006, -2978, 3239, -2978, 119), (23, 87, 2726, -2977, 2940, -2977, 261),
    (24, 88, -4324, -3105, 3193, -2976, 977), (25, 89, -2836, -2996, 3042, -2975, 2652),
    (26, 90, -14401, -2974, 2999, -2974, -1327), (27, 91, -7226, -2981, 3352, -2973, 775),
    (28, 92, -41868, -3002, 2749, -2972, -2636), (29, 93, 3702, -2971, 3213, -2971, 84),
    (30, 94, -5915, -3327, 3197, -2970, -2375), (31, 95, -20912, -3192, 2996, -2969, 1496),
    (32, 96, 5762, -3286, 3202, -2968, -42), (33, 97, -1632, -3066, 2751, -2967, -1335),
    (34, 98, -15243, -3254, 3301, -2966, -2406), (35, 99, -25933, -2965, 3003, -2965, -2086),
    (36, 100, -8194, -3062, 3203, -2964, -2174), (37, 101, 7754, -3176, 3177, -2963, -1208),
    (38, 102, -18120, -3126, 3225, -2962, -563), (39, 103, -21808, -3232, 2897, -2961, 1515),
    (40, 104, -5800, -3070, 3018, -2960, -2426), (41, 64, -18718, -3066, 3080, -2959, -841),
    (42, 65, -39706, -3266, 3049, -2958, -2568), (43, 66, -16816, -3078, 3050, -2957, 2031),
    (44, 67, -14930, -3152, 3218, -2956, 1231), (45, 68, -27423, -3017, 3148, -2955, 771),
    (46, 69, -18869, -3274, 2789, -2954, 917), (47, 70, -9541, -2955, 3100, -2953, 988),
    (48, 71, -29340, -2972, 3264, -2952, 1690), (49, 72, -5353, -3008, 3224, -2951, 2376),
    (50, 73, -43437, -2950, 2961, -2950, -1485), (51, 74, -8199, -2949, 3191, -2949, 326),
    (52, 75, -32617, -3090, 2939, -2948, 2498), (53, 76, -10767, -3231, 3277, -2947, -787),
    (54, 77, -35312, -3164, 3213, -2946, 1835), (55, 78, -5266, -2945, 3041, -2945, -480),
    (56, 79, -9119, -2944, 3256, -2944, -1822), (57, 80, -7313, -3056, 3147, -2943, 2614),
    (58, 81, -9167, -3214, 3179, -2942, 1315), (59, 82, -36002, -2953, 2959, -2941, 245),
    (60, 83, -29378, -3111, 2492, -2940, -19), (61, 84, -3833, -3144, 3041, -2939, 297),
    (62, 85, -5102, -3095, 3353, -2938, 1827), (63, 86, -11636, -3127, 2961, -2937, 1930),
    (64, 87, -32063, -3460, 3464, -2936, -1810), (65, 88, -13235, -2935, 3032, -2935, 251),
    (66, 89, 9126, -2934, 3033, -2934, -2755), (67, 90, -30148, -3189, 3307, -2933, 455),
    (68, 91, -23725, -2932, 3303, -2932, 457), (69, 92, -9228, -3195, 2909, -2931, 2549),
    (70, 93, -4611, -3087, 3292, -2930, 918), (71, 94, -27820, -2929, 3262, -2929, 823),
    (72, 95, -25682, -3286, 3277, -2928, 372), (73, 96, -5194, -2927, 2821, -2927, 430),
    (74, 97, -2524, -3289, 3318, -2926, 1237), (75, 98, -15695, -3076, 3003, -2925, -2895),
    (76, 99, -2248, -3162, 3170, -2924, -1262), (77, 100, 6704, -3090, 3198, -2923, 1624),
    (78, 101, 6053, -3367, 3130, -2922, -564), (79, 102, -27217, -3143, 3133, -2921, 2619),
    (80, 103, -26705, -3057, 3099, -2920, 822), (81, 104, -28235, -3276, 2717, -2919, -778),
    (82, 64, -18932, -3212, 2906, -2918, -355), (83, 65, -11614, -2917, 3225, -2917, -2426),
    (84, 66, -25924, -3381, 3182, -2916, 1169), (85, 67, -8684, -2915, 3198, -2915, 579),
    (86, 68, -21194, -2928, 2716, -2914, -266), (87, 69, -32295, -2913, 2933, -2913, -687),
    (88, 70, -20184, -3220, 2912, -2912, -148), (89, 71, -32842, -3215, 3147, -2911, 875),
    (90, 72, -28896, -2980, 3388, -2910, 1484), (91, 73, -26283, -3278, 3058, -2909, -3278),
    (92, 74, -11175, -3054, 3183, -2908, -691), (93, 75, -9597, -2953, 3067, -2907, 2013),
    (94, 76, 1845, -3097, 3470, -2906, -1253), (95, 77, -17042, -3083, 3146, -2905, 2760),
    (96, 78, -25326, -2957, 3095, -2904, 283), (97, 79, -4987, -3038, 2950, -2903, -506),
    (98, 80, -29494, -3058, 2963, -2902, -1791), (99, 81, -27642, -3073, 3081, -2901, -1682),
    (100, 82, -2063, -3285, 3117, -2900, -1827), (101, 83, -28331, -3039, 3049, -2899, -608),
    (102, 84, -28043, -3277, 3284, -2898, 697), (103, 85, -42631, -3324, 2911, -2897, 2611),
    (104, 86, -31533, -3151, 3215, -2896, -792), (105, 87, -37025, -3181, 3013, -2895, 1851),
    (106, 88, -5658, -3159, 3173, -2894, -281), (107, 89, -12804, -2902, 3033, -2893, -2621),
    (108, 90, 1619, -2929, 3053, -2892, 2781), (109, 91, -11468, -3336, 3019, -2891, 1977),
    (110, 92, -16352, -3219, 3193, -2890, 1351), (111, 93, -26863, -2889, 3056, -2889, 2175),
    (112, 94, -18907, -3132, 3057, -2888, -2472), (113, 95, -28943, -3086, 3154, -2887, -670),
    (114, 96, 10994, -2933, 3168, -2886, 1985), (115, 97, -138, -2988, 3087, -2885, -1719),
    (116, 98, -9339, -3329, 3212, -2884, 1549), (117, 99, 13402, -3329, 3021, -2883, 349),
    (118, 100, -29832, -3111, 3167, -2882, -585), (119, 101, -9267, -3394, 3342, -2881, -1435),
    (120, 102, -28216, -3072, 3419, -2880, -936), (121, 103, -43870, -3168, 3063, -2879, 4),
    (122, 104, -10779, -3269, 3178, -2878, 1765), (123, 64, -40551, -2985, 2920, -2877, -91),
    (124, 65, -14600, -2991, 3034, -2876, -2368), (125, 66, -6074, -3172, 3279, -2875, 1782),
    (126, 67, -1945, -2874, 3254, -2874, -73), (127, 68, -11770, -3068, 2814, -2873, -846),
    (128, 69, -25235, -3020, 3196, -2872, -1391), (129, 70, -23188, -3216, 3084, -2871, -1876),
    (130, 71, -21312, -3175, 3449, -2870, -213), (131, 72, -36538, -3282, 3156, -2869, 551),
    (132, 73, -57260, -3327, 3222, -2868, 1756), (133, 74, -20589, -3177, 3370, -2867, -1522),
    (134, 75, -3552, -3138, 3205, -2866, 1554), (135, 76, -33217, -2865, 2934, -2865, -1282),
    (136, 77, -29296, -3299, 3245, -2864, 3245), (137, 78, -2328, -2863, 3094, -2863, 1440),
    (138, 79, -29121, -2959, 2930, -2862, 1437), (139, 80, -7684, -3255, 3163, -2861, 346),
    (140, 81, -12902, -3240, 2919, -2860, 1089), (141, 82, -16010, -3007, 3156, -2859, 2359),
    (142, 83, -34753, -3251, 3274, -2858, -1670), (143, 84, -20203, -3199, 3120, -2857, 350),
    (144, 85, -27378, -3165, 2835, -2856, -1466), (145, 86, -35363, -3109, 3040, -2855, 1086),
    (146, 87, -14675, -3007, 3178, -2854, -696), (147, 88, -9222, -3246, 3049, -2853, -1515),
    (148, 89, -27420, -3161, 3185, -2852, -2318), (149, 90, -15939, -3272, 3094, -2851, -1382),
    (150, 91, -6219, -3170, 3062, -2850, -1114), (151, 92, -27626, -3239, 2919, -2849, 1113),
    (152, 93, -25011, -3042, 3184, -2848, -2612), (153, 94, -13042, -3176, 2797, -2847, 269),
    (154, 95, -30832, -3119, 2988, -2846, -1934), (155, 96, -3239, -3039, 3116, -2845, 2674),
    (156, 97, -21378, -3164, 3303, -2844, 1349), (157, 98, -3346, -3039, 3133, -2843, 1571),
    (158, 99, -44196, -3066, 3148, -2842, 2303), (159, 100, -10949, -3150, 3179, -2841, -2794),
)

_ADPCM_SQL = (
    "SELECT d.doc_id, v.n_samples, v.sum_val, v.min_val, v.max_val, "
    "v.first_val, v.last_val FROM documents d JOIN (VALUES "
    + ", ".join(f"({i}, {n}, {s}, {lo}, {hi}, {f}, {l})" for i, n, s, lo, hi, f, l in _ADPCM_EXPECTED)
    + ") AS v(doc_id, n_samples, sum_val, min_val, max_val, first_val, last_val) "
    "ON d.doc_id = v.doc_id"
)


@query("q_adpcm_roundtrip", _ADPCM_SQL)
def q_adpcm_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IMA-ADPCM WAV (format 0x0011, the 4:1 voicemail/telephony codec):
    deterministic int16 signals encode through the block framing
    (block_frames=33 exercises many multi-block streams + partial final
    blocks via the fact chunk) and decode back through the unified
    decode_audio dispatch; per-doc statistics must match the
    audioop-authored constants table for the sf-independent id range
    doc_id < 160 (constants-oracle pattern, same as q_uuid5_ids)."""
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("n_samples", LongType()),
            StructField("sum_val", LongType()),
            StructField("min_val", LongType()),
            StructField("max_val", LongType()),
            StructField("first_val", LongType()),
            StructField("last_val", LongType()),
        ]
    )

    def roundtrip(pdfs):
        import numpy as np

        from vectorflow_spark.operators.aiffmini import encode_wav_ima_adpcm
        from vectorflow_spark.operators.codecs import decode_audio

        for pdf in pdfs:
            rows = []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                n = 64 + (i % 41)
                s = np.array(
                    [(((i + 3) * (k * k + 7 * k + 1)) % 6007) - 3003 for k in range(n)],
                    dtype=np.int16,
                )
                dec, rate = decode_audio(encode_wav_ima_adpcm(s, 8000, block_frames=33))
                assert rate == 8000
                v = dec.astype(np.int64)
                rows.append((i, len(v), int(v.sum()), int(v.min()), int(v.max()), int(v[0]), int(v[-1])))
            yield pd.DataFrame(rows, columns=out_schema.fieldNames())

    docs = (
        _t(spark, sf_dir, "documents", split=True)
        .filter(F.col("doc_id") < 160)
        .select("doc_id")
    )
    return docs.mapInPandas(roundtrip, out_schema)
