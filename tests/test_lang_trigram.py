"""Trigram language-ID (lang.py): whatlanggo-class behaviour for the
language sanity gate (reference utils-extractor.go:96-109, core.go:196).
Script shortcuts, Latin/Cyrillic trigram families, and the gate's
reject-on-any-mismatch condition."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from go_trafilatura_spark.lang import detect
from go_trafilatura_spark.core import ExtractError, extract
from go_trafilatura_spark.options import Config, Options

CASES = [
    ("The government announced new measures that will take effect from the "
     "beginning of next year and apply to all residents", "en"),
    ("Die Regierung hat neue Maßnahmen angekündigt die ab Anfang nächsten "
     "Jahres gelten und für alle Einwohner verbindlich sind", "de"),
    ("Le gouvernement a annoncé de nouvelles mesures qui entreront en "
     "vigueur au début de l'année prochaine pour tous les habitants", "fr"),
    ("El gobierno anunció nuevas medidas que entrarán en vigor a principios "
     "del próximo año y se aplicarán a todos los residentes", "es"),
    ("Il governo ha annunciato nuove misure che entreranno in vigore "
     "all'inizio del prossimo anno per tutti i residenti", "it"),
    ("O governo anunciou novas medidas que entrarão em vigor no início do "
     "próximo ano e serão aplicadas a todos os residentes", "pt"),
    ("De regering heeft nieuwe maatregelen aangekondigd die begin volgend "
     "jaar van kracht worden voor alle inwoners van het land", "nl"),
    ("Rząd ogłosił nowe środki które wejdą w życie na początku przyszłego "
     "roku i będą obowiązywać wszystkich mieszkańców", "pl"),
    ("Regeringen har meddelat nya åtgärder som träder i kraft i början av "
     "nästa år och gäller alla invånare i landet", "sv"),
    ("Hallitus ilmoitti uusista toimenpiteistä jotka tulevat voimaan ensi "
     "vuoden alusta ja koskevat kaikkia asukkaita", "fi"),
    ("Правительство объявило о новых мерах которые вступят в силу с начала "
     "следующего года и будут касаться всех жителей", "ru"),
    ("Уряд оголосив про нові заходи які набудуть чинності з початку "
     "наступного року і стосуватимуться всіх жителів", "uk"),
    ("政府は来年の初めから施行される新しい措置を発表しました。すべての住民に適用されます。", "ja"),
    ("政府宣布了将于明年年初生效的新措施，适用于所有居民。", "zh"),
    ("정부는 내년 초부터 시행되는 새로운 조치를 발표했습니다", "ko"),
    ("أعلنت الحكومة عن تدابير جديدة ستدخل حيز التنفيذ اعتبارا من بداية العام المقبل", "ar"),
    ("Η κυβέρνηση ανακοίνωσε νέα μέτρα που θα τεθούν σε ισχύ από τις αρχές "
     "του επόμενου έτους για όλους τους κατοίκους", "el"),
    ("Hükümet gelecek yılın başından itibaren yürürlüğe girecek yeni "
     "önlemler açıkladı ve bütün sakinler için geçerli olacak", "tr"),
    ("Pemerintah mengumumkan langkah-langkah baru yang akan berlaku mulai "
     "awal tahun depan untuk semua penduduk", "id"),
    ("Regeringen har annonceret nye foranstaltninger som træder i kraft fra "
     "begyndelsen af næste år og gælder alle indbyggere", "da"),
    ("Vláda oznámila nová opatření která vstoupí v platnost od začátku "
     "příštího roku a budou platit pro všechny obyvatele", "cs"),
    ("Guvernul a anunțat noi măsuri care vor intra în vigoare de la "
     "începutul anului viitor pentru toți locuitorii", "ro"),
    ("A kormány új intézkedéseket jelentett be amelyek jövő év elejétől "
     "lépnek életbe és minden lakosra vonatkoznak", "hu"),
]


@pytest.mark.parametrize("text,lang", CASES, ids=[l for _, l in CASES])
def test_detect(text, lang):
    assert detect(text) == lang


def test_empty_and_letterless():
    assert detect("") == ""
    assert detect("12345 --- 678") == ""


def _page(text):
    return f"<html><body><article><p>{text}</p></article></body></html>".encode()


def _opts(target):
    return Options(
        config=Config(min_extracted_size=0, min_output_size=0,
                      min_output_comment_size=0,
                      min_extracted_comment_size=0),
        target_language=target,
    )


GERMAN = ("Die Regierung hat neue Maßnahmen angekündigt die ab Anfang "
          "nächsten Jahres gelten und für alle Einwohner verbindlich sind. "
          "Viele Menschen haben bereits darauf reagiert und ihre Meinung "
          "geäußert, aber die Entscheidung ist endgültig.")


def test_gate_accepts_matching_language():
    res = extract(_page(GERMAN), _opts("de"))
    assert res.metadata.language == "de"


def test_gate_rejects_mismatch():
    # reference core.go:196-201: ANY classifier answer that is not the
    # target rejects the document
    with pytest.raises(ExtractError) as e:
        extract(_page(GERMAN), _opts("en"))
    assert e.value.reason == "wrong_language"


def test_language_recorded_without_target():
    res = extract(_page(GERMAN), _opts(""))
    assert res.metadata.language == "de"
