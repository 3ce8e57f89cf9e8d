"""Engine-wide constants mirroring the reference's hard-coded vocabulary.

Each constant cites the reference file:line it reproduces.
"""
from __future__ import annotations

# ---- edge types ------------------------------------------------------------
# emitted by the reference DFS (network_class.py:57) and routed on throughout
CAUSES = "causes_or_promotes"                                    # make_graph_class.py:423
INHIBITS = "is_inhibited_or_prevented_or_blocked_or_slowed_by"   # make_graph_class.py:322
MYTH_ABOUT = "is_a_myth_about"                                   # process_myths.py:29
EXPOSURE = "has_exposure_dependency_of"
POPULATION = "population_affected"
IS_A = "is_a"                                                    # network_class.py:80

EDGE_TYPES = [CAUSES, INHIBITS, MYTH_ABOUT, EXPOSURE, POPULATION, IS_A]

# ---- root node of the causal web -------------------------------------------
GREENHOUSE_EFFECT = "increase in greenhouse effect"              # make_graph_class.py:441,516

# ---- source annotation properties (ontology_processing_utils.py:65-75) ------
SOURCE_TYPES = [
    "dc_source",
    "schema_academicBook",
    "schema_academicSourceNoPaywall",
    "schema_academicSourceWithPaywall",
    "schema_governmentSource",
    "schema_mediaSource",
    "schema_mediaSourceForConservatives",
    "schema_organizationSource",
]

# ---- personal values -------------------------------------------------------
# order is load-bearing (alphabetical by value name, make_graph_class.py:178-266)
PERSONAL_VALUES_19 = [
    "achievement",
    "benevolence_caring",
    "benevolence_dependability",
    "conformity_interpersonal",
    "conformity_rules",
    "face",
    "hedonism",
    "humility",
    "power_dominance",
    "power_resources",
    "security_personal",
    "security_societal",
    "self-direction_autonomy_of_action",
    "self-direction_autonomy_of_thought",
    "stimulation",
    "tradition",
    "universalism_concern",
    "universalism_nature",
    "universalism_tolerance",
]

# pv10 slot -> list of pv19 keys collapsed into it (make_graph_class.py:208-263)
PERSONAL_VALUES_10 = [
    ("achievement", ["achievement"]),
    ("benevolence", ["benevolence_caring", "benevolence_dependability"]),
    ("conformity", ["conformity_interpersonal", "conformity_rules"]),
    ("hedonism", ["hedonism"]),
    ("power", ["power_dominance", "power_resources"]),
    ("security", ["security_personal", "security_societal"]),
    ("self_direction", ["self-direction_autonomy_of_action",
                        "self-direction_autonomy_of_thought"]),
    ("stimulation", ["stimulation"]),
    ("tradition", ["tradition"]),
    ("universalism", ["universalism_concern", "universalism_nature",
                      "universalism_tolerance"]),
]

# political vector order: conservative first (make_graph_class.py:293-304)
POLITICAL_KEYS = ["conservative", "liberal"]

# ---- acyclic cut classes (make_graph_class.py:395-431) ----------------------
FEEDBACK_LOOP_CLASS = "feedback loop"
CUT_TARGET_CLASSES = [
    "increase in atmospheric greenhouse gas",
    "root cause linked to humans",
]

# ---- test-ontology allow/deny sets (ontology_processing_utils.py:94-142) ----
VALID_TEST_ONT = {
    "test ontology", "personal value", "achievement", "benevolence",
    "benevolence caring", "benevolence dependability", "conformity",
    "conformity interpersonal", "conformity rules", "face", "hedonism",
    "humility", "power", "power dominance", "power resources", "security",
    "security personal", "security societal", "self-direction",
    "self-direction autonomy of action", "self-direction autonomy of thought",
    "stimulation", "tradition", "universalism", "universalism concern",
    "universalism nature", "universalism tolerance",
}
NON_TEST_ONT = {
    "value uncategorized (to do)", "risk solution", "adaptation",
    "geoengineering", "indirect adaptation", "indirect geoengineering",
    "indirect mitigration", "carbon pricing", "carbon tax",
    "emissions trading", "mitigation",
    "solution to indirect adaptation barrier",
    "solution to indirect mitigation barrier",
    "solution uncategorized (to do)",
}

# ---- scale knobs ------------------------------------------------------------
# shuffle partitions default for local runs; on a real cluster set to
# ~2-3x total executor cores via spark-submit conf
DEFAULT_SHUFFLE_PARTITIONS = 32
# number of salt buckets for skewed head-domain aggregations
DEFAULT_SALT_BUCKETS = 16
