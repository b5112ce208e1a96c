"""Synthetic EMBL fixture corpus covering every SURVEY.md §2.10 quirk.

``FILES`` maps a relative path (mirroring the ENA ``wgs/<x>/<y>`` and
``sequence/<x>`` layouts) to flat-file text.  ``IDMAPPING`` is the
lookup-table fixture (FIXTURES.md §3: foreign ids with 0, 1 and >=2
uniprot rows).  ``EXPECTED_ENA_TAB`` is the golden 7-column output,
derived by executing the reference implementation
(/root/reference/ena_build/parse_embl.py process_file) over these exact
fixtures with an offline reverse-mapping stub — see
tests/tools/gen_golden.py.
"""

FILE_WGS = "\n".join(
    [
        "ID   ABZA01000001; SV 1; linear; genomic DNA; WGS; PRO; 1000 BP.",
        "XX",
        "OC   Bacteria; Pseudomonadota; some lineage.",
        "XX",
        "FT   source          1..1000",
        'FT                   /organism="Test organism"',
        "FT   gene            340..565",
        'FT                   /locus_tag="T_001"',
        "FT   CDS             340..565",
        'FT                   /locus_tag="T_001"',
        'FT                   /db_xref="UniProtKB/TrEMBL:B6Y618"',
        'FT                   /protein_id="EEB56106.1"',
        'FT                   /translation="MLK"',
        "ID   ABZA01000002; SV 1; circular; genomic DNA; WGS; PRO; 1000 BP.",
        "XX",
        "OC   Bacteria; lineage.",
        "FT   source          1..1000",
        "FT   CDS             complement(join(900..1000,1..70))",
        'FT                   /db_xref="UniProtKB/TrEMBL:B6Y700"',
        'FT                   /protein_id="EEB56107.1"',
        "ID   ABZA01000003; SV 1; linear; genomic DNA; WGS; PRO; 2000 BP.",
        "OC   Bacteria; lineage.",
        "FT   CDS             467",
        'FT                   /protein_id="AAA0.1"',
        "FT   CDS             100..200",
        "FT   CDS             join(250..300,350..400)",
        'FT                   /protein_id="AAA1.1"',
        'FT                   /protein_id="AAA2.1"',
        "",
    ]
)

FILE_SEQUENCE_PRO = "\n".join(
    [
        "ID   EUK0001; SV 1; linear; genomic DNA; STD; PRO; 5000 BP.",
        "OC   Eukaryota; Metazoa; Chordata.",
        "FT   CDS             1..100",
        'FT                   /protein_id="EEB56106.1"',
        "ID   FUN0001; SV 1; linear; genomic DNA; STD; PRO; 5000 BP.",
        "OC   Eukaryota; Fungi; Dikarya.",
        "FT   CDS             join(1..100,J00194.1:100..202)",
        'FT                   /protein_id="CCC1.1"',
        "ID   HC710378; SV 1; XXX; protein; PRT; PRO; 409 BP.",
        "FT   CDS             1..50",
        'FT                   /protein_id="AAA1.1"',
        "ID   BADLINE; SV 1; linear; genomic DNA; STD; PRO;",
        "FT   CDS             1..50",
        'FT                   /protein_id="AAA1.1"',
        "ID   SEQ0001; SV 1; linear; genomic DNA; STD; PRO; 900 BP.",
        "OC   Bacteria; lineage.",
        "FT   CDS             <1..888",
        'FT                   /db_xref="UniProtKB/TrEMBL:Q00001"',
        "",
    ]
)

# Edge cases: CDS block open at EOF (no trailing newline), stray
# qualifier-continuation lines before any CDS, a non-CDS feature block
# between two CDS blocks, a record whose only content is OC lines.
FILE_EDGE = (
    "\n".join(
        [
            "ID   EDGE0001; SV 1; linear; genomic DNA; WGS; PRO; 3000 BP.",
            "OC   Bacteria; lineage.",
            'FT                   /db_xref="UniProtKB/TrEMBL:STRAY1"',
            "FT   CDS             10..20",
            'FT                   /db_xref="UniProtKB/TrEMBL:E00001"',
            "FT   gene            30..40",
            'FT                   /locus_tag="ignored"',
            "FT   CDS             complement(50..60)",
            'FT                   /db_xref="UniProtKB/TrEMBL:E00002"',
            "ID   EDGE0002; SV 1; linear; genomic DNA; WGS; PRO; 500 BP.",
            "OC   Bacteria; lineage.",
            "ID   EDGE0003; SV 1; circular; genomic DNA; WGS; PRO; 100 BP.",
            "OC   Bacteria; lineage.",
            # equal-start ranges: the reference's stable sort keeps the
            # longer range first, which changes the circular gap result
            "FT   CDS             join(40..80,40..45,90..100)",
            'FT                   /db_xref="UniProtKB/TrEMBL:E00004"',
            "FT   CDS             join(90..100,1..10)",
        ]
    )
    + '\nFT                   /db_xref="UniProtKB/TrEMBL:E00003"'
)

# Excluded by F1: filename has no _(ENV|PRO|FUN|PHG)_ division tag.
FILE_SEQUENCE_OTHER = "\n".join(
    [
        "ID   CON0001; SV 1; linear; genomic DNA; STD; PRO; 500 BP.",
        "OC   Bacteria; lineage.",
        "FT   CDS             10..20",
        'FT                   /db_xref="UniProtKB/TrEMBL:ZZ9999"',
        "",
    ]
)

FILES = {
    "wgs/public/abz/ABZA01.dat.gz": FILE_WGS,
    "wgs/public/edg/EDGE01.dat.gz": FILE_EDGE,
    "sequence/pro/rel_std_PRO_01_r138.dat.gz": FILE_SEQUENCE_PRO,
    "sequence/con/rel_std_con_01_r138.dat.gz": FILE_SEQUENCE_OTHER,
}

# foreign_id -> uniprot rows: 0 (EEB56107.1 absent), 1, and >=2 cases;
# AAA1.1/AAA2.1 both map to X1 to pin the duplicate-row quirk (§2.10.8).
IDMAPPING = [
    ("EEB56106.1", "B6Y618"),
    ("EEB56106.1", "B6Y001"),
    ("AAA1.1", "X1"),
    ("AAA2.1", "X1"),
    ("CCC1.1", "Y1"),
    ("UNUSED.1", "Z9"),
]

# (ena_id, uniprot_id, locus_num, chr_struct, direction, start, end)
# Golden output of the reference implementation on FILES + IDMAPPING
# (sorted); regenerate with tests/tools/gen_golden.py.
EXPECTED_ENA_TAB = [
    ("ABZA01000001", "B6Y001", 1, 1, 1, 340, 565),
    ("ABZA01000001", "B6Y618", 1, 1, 1, 340, 565),
    ("ABZA01000002", "B6Y700", 1, 0, 0, 900, 70),
    ("ABZA01000003", "X1", 2, 1, 1, 250, 400),
    ("ABZA01000003", "X1", 2, 1, 1, 250, 400),
    ("EDGE0001", "E00001", 1, 1, 1, 10, 20),
    ("EDGE0001", "E00002", 2, 1, 0, 50, 60),
    ("EDGE0003", "E00003", 2, 0, 1, 90, 10),
    ("EDGE0003", "E00004", 1, 0, 1, 90, 45),
    ("FUN0001", "Y1", 1, 1, 1, 1, 202),
    ("SEQ0001", "Q00001", 1, 1, 1, 1, 888),
]
