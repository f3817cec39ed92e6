"""Cavnar-Trenkle langid: the METHOD must discriminate real text even
though the synthetic corpus (one shared vocabulary across lang labels)
can't show it — and the ranked profiles must be well-formed."""

from __future__ import annotations

from orders_kafka_streams_spark.operators.text import (
    CT_PROFILES,
    CT_TOP_M,
    ct_langid,
)

SENTS = [
    # (id, true lang, text) — function-word-heavy natural sentences
    (1, "en", "the quick brown fox jumped over the lazy dog and then "
              "ran into the woods looking for something to eat in the evening"),
    (2, "en", "it was the best of times and it was the worst of times in "
              "the city of london during the revolution of the people"),
    (3, "de", "die kinder spielen in dem garten und der hund schlaeft "
              "unter dem baum waehrend die sonne scheint und die voegel singen"),
    (4, "de", "der schnelle braune fuchs springt ueber den faulen hund "
              "und die katze schaut den tieren aus dem fenster zu"),
    (5, "fr", "le chat dort sur le canape pendant que les enfants jouent "
              "dans le jardin et que la pluie tombe sur la ville"),
    (6, "fr", "la langue que nous parlons est celle de la republique et "
              "les personnes qui habitent dans le pays la comprennent"),
    (7, "es", "el perro corre por el parque mientras los ninos juegan en "
              "la calle y la gente camina por la ciudad en la manana"),
    (8, "es", "la casa de mis abuelos esta cerca de la playa y en el "
              "verano vamos alla para nadar en el mar con los amigos"),
]


def test_profiles_are_well_formed():
    for lang, prof in CT_PROFILES.items():
        assert len(set(prof)) == len(prof), f"duplicate trigram in {lang} profile"
        assert all(len(g) == 3 for g in prof), f"non-trigram entry in {lang}"
        assert len(prof) >= CT_TOP_M, f"{lang} profile shallower than doc depth"


def test_ct_discriminates_natural_text(spark):
    docs = spark.createDataFrame(SENTS, "doc_id long, lang string, text string")
    got = {r.doc_id: r.pred_lang for r in ct_langid(docs).collect()}
    expected = {i: lang for i, lang, _ in SENTS}
    n_right = sum(got[i] == expected[i] for i in expected)
    # the method must beat chance decisively on clean natural text:
    # require at least 7 of 8 sentences right (both per-language pairs)
    assert n_right >= 7, {i: (expected[i], got[i]) for i in expected}
