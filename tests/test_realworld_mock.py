"""Real-world page parity: run the full cascade on the reference's own
saved pages (test-files/mock/*) and assert the substring markers from
/root/reference/realworld_test.go:32-642 (With/Without style, matching
scripts/comparison semantics).

These tests read the reference corpus read-only; they skip when the
reference checkout is absent.
"""

import os

import pytest

from go_trafilatura_spark import ExtractError, Options, extract

MOCK_DIR = "/root/reference/test-files/mock"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(MOCK_DIR), reason="reference mock corpus not available"
)

# (file, url, with_markers, without_markers) — realworld_test.go:45-290
CASES = [
    ("die-partei.net.luebeck.html",
     "https://die-partei.net/luebeck/2012/05/31/das-ministerium-fur-club-kultur-informiert/",
     ["Die GEMA dreht völlig am Zeiger!"], ["Impressum"]),
    ("bmjv.de.konsum.html",
     "https://www.bmjv.de/DE/Verbraucherportal/KonsumImAlltag/TransparenzPreisanpassung/TransparenzPreisanpassung_node.html",
     ["Anbieter von Fernwärme haben innerhalb ihres Leitungsnetzes ein Monopol"],
     ["Impressum"]),
    ("denkanstoos.com.2012.html",
     "https://denkanstoos.wordpress.com/2012/04/11/denkanstoos-april-2012/",
     ["Two or three 10-15 min", "What type? Etc. (30 mins)"],
     ["Dieser Eintrag wurde veröffentlicht", "Mit anderen Teillen"]),
    ("ebrosia.de.zinfandel.html",
     "https://www.ebrosia.de/beringer-zinfandel-rose-stone-cellars-lieblich-suess",
     ["Das Bukett präsentiert sich", "Besonders gut passt er zu asiatischen Gerichten"],
     ["Kunden kauften auch", "Gutschein sichern"]),
    ("landwirt.com.sensortechnik.html",
     "https://www.landwirt.com/Precision-Farming-Moderne-Sensortechnik-im-Kuhstall,,4229,,Bericht.html",
     ["Überwachung der somatischen Zellen", "tragbaren Ultraschall-Geräten", "Kotkonsistenz"],
     ["Anzeigentarife", "Aktuelle Berichte aus dieser Kategorie"]),
    ("rs-ingenieure.de.tragwerksplanung.html",
     "http://www.rs-ingenieure.de/de/hochbau/leistungen/tragwerksplanung",
     ["Wir bearbeiten alle Leistungsbilder"], ["Brückenbau"]),
    ("shingon-reiki.de.schamanismus.html",
     "http://www.shingon-reiki.de/reiki-und-schamanismus/",
     ["Heut geht es", "Ich komme dann zu dir vor Ort."],
     ["Catch Evolution", "und gekennzeichnet mit"]),
    ("love-hina.ch.0409.html",
     "http://love-hina.ch/news/0409.html",
     ["Kapitel 121 ist"], ["Kommentare schreiben"]),
    ("cdu-fraktion-erfurt.de.waldorfschule.html",
     "http://www.cdu-fraktion-erfurt.de/inhalte/aktuelles/entwicklung-der-waldorfschule-ermoeglicht/index.html",
     ["der steigenden Nachfrage gerecht zu werden."],
     ["Zurück zur Übersicht", "Erhöhung für Zoo-Eintritt"]),
    ("de.creativecommons.org.endlich.html",
     "https://de.creativecommons.org/index.php/2014/03/20/endlich-wird-es-spannend-die-nc-einschraenkung-nach-deutschem-recht/",
     ["das letzte Wort sein kann."], ["Ähnliche Beiträge"]),
    ("piratenpartei-mv.de.grundeinkommen.html",
     "https://piratenpartei-mv.de/blog/2013/09/12/grundeinkommen-ist-ein-menschenrecht/",
     ["Unter diesem Motto findet am 14. September", "Volksinitiative Schweiz zum Grundeinkommen."],
     ["getaggt mit:", "Was denkst du?"]),
    ("spektrum.de.engelbart.html",
     "https://scilogs.spektrum.de/engelbart-galaxis/die-ablehnung-der-gendersprache/",
     ["Zweitens wird der Genderstern", "alldem leider – nichts."], []),
    ("wehranlage-horka.de.887.html",
     "http://www.wehranlage-horka.de/veranstaltung/887/",
     ["In eine andere Zeit", "Während Sie über den Markt schlendern"],
     ["Infos zum Verein", "nach oben", "Datenschutzerklärung"]),
    ("simplyscience.ch.erdoel.html",
     "http://www.simplyscience.ch/teens-liesnach-archiv/articles/wie-entsteht-erdoel.html",
     ["Erdöl bildet nach Millionen", "Warum wird das Erdöl knapp?"],
     ["Die Natur ist aus chemischen Elementen aufgebaut"]),
    ("rnz.de.witzel.html",
     "https://www.rnz.de/nachrichten_artikel,-zz-dpa-Schlaglichter-Frank-Witzel-erhaelt-Deutschen-Buchpreis-2015-_arid,133484.html",
     ["Für einen Roman", "Auszeichnung der Branche."], []),
    ("buchperlen.wordpress.com.html",
     "https://buchperlen.wordpress.com/2013/10/20/leandra-lou-der-etwas-andere-modeblog-jetzt-auch-zwischen-buchdeckeln/",
     ["Dann sollten Sie erst recht", "als saure Gürkchen entlarvte Ex-Boyfriends."],
     ["Ähnliche Beiträge"]),
    ("toralin.de.schmierfett.html",
     "http://www.toralin.de/schmierfett-reparierend-verschlei-y-910.html",
     ["künftig das XADO-Schutzfett verwenden.", "bis zu 50% Verschleiß.",
      "Die Lebensdauer von Bauteilen erhöht sich beträchtlich."],
     ["Newsletter", "Sie könnten auch an folgenden Artikeln interessiert sein"]),
    ("fairkom.eu.about.html",
     "https://www.fairkom.eu/about",
     ["ein gemeinwohlorientiertes Partnerschaftsnetzwerk",
      "Stimmberechtigung bei der Generalversammlung."],
     ["support@fairkom.eu"]),
    ("futurezone.at.lyft.html",
     "https://futurezone.at/digital-life/uber-konkurrent-lyft-startet-mit-waymo-robotertaxis-in-usa/400487461",
     ["Einige Kunden des Fahrdienst-Vermittler Lyft", "zeitweise rund vier Prozent."],
     ["Allgemeine Nutzungsbedingungen", "Waymo bittet Autohersteller um Geld"]),
    ("hundeverein-kreisunna.de.html",
     "http://www.hundeverein-kreisunna.de/unserverein.html",
     ["Beate und Norbert Olschewski", "ein Familienmitglied und unser Freund."],
     ["zurück zur Startseite"]),
    ("viehbacher.com.steuerrecht.html",
     "https://viehbacher.com/de/steuerrecht",
     ["und wirtschaftlich orientierte Privatpersonen", "rund um die Uhr.",
      "Mensch im Mittelpunkt."],
     ["Was sind Cookies?"]),
    ("jovelstefan.de.gefallt.html",
     "http://www.jovelstefan.de/2011/09/11/gefallt-mir/",
     ["Manchmal überrascht einen", "kein Meisterwerk war!"],
     ["Pingback von", "Kommentare geschlossen"]),
    ("stuttgart.de.html",
     "https://www.stuttgart.de/item/show/132240/1",
     ["Das Bohnenviertel entstand", "sich herrlich entspannen."],
     ["Nützliche Links", "Mehr zum Thema"]),
    ("kulinariaathome.com.mandelplätzchen.html",
     "http://kulinariaathome.wordpress.com/2012/12/08/mandelplatzchen/",
     ["zu einem glatten Teig verarbeiten.", "goldbraun sind.", "200 g Zucker",
      "Ein Backblech mit Backpapier auslegen."],
     ["Sei der Erste", "Gefällt mir", "Trotz sorgfältiger inhaltlicher Kontrolle"]),
    ("austria.info.radfahren.html",
     "https://www.austria.info/de/aktivitaten/radfahren/radfahren-in-der-weltstadt-salzburg",
     ["Salzburg liebt seine Radfahrer.", "Puls einsaugen zu lassen."],
     ["Das könnte Sie auch interessieren ...", "So macht Radfahren sonst noch Spaß"]),
    ("modepilot.de.duschkopf.html",
     "https://www.modepilot.de/2019/05/21/geht-euch-auch-so-oder-auf-reisen-nie-ohne-meinen-duschkopf/",
     ["Allerdings sieht es wie ein Dildo aus,", "gibt Bescheid, ne?"],
     ["Ähnliche Beiträge", "Deine E-Mail (bleibt natürlich unter uns)"]),
    ("otto.de.twoforfashion.html",
     "https://www.otto.de/twoforfashion/strohtasche/",
     ["Ob rund oder kastenförmig, ob dezent oder auffällig", "XX, Die Redaktion"],
     [" Kommentieren", "Dienstag, 4. Juni 2019"]),
    ("iloveponysmag.com.barbour.html",
     "http://iloveponysmag.com/2018/05/24/barbour-coastal/",
     ["Eine meiner besten Entscheidungen bisher:",
      "Verlassenes Gewächshaus meets versteckter Deich",
      "Der Hundestrand in Stein an der Ostsee",
      "Bitte (noch) mehr Bilder von Helle"],
     ["Tags: Barbour,", "Hinterlasse einen Kommentar"]),
    ("moritz-meyer.net.vreni.html",
     "https://moritz-meyer.net/blog/vreni-frost-instagram-abmahnung/",
     ["Das ist alles nicht gekennzeichnet, wie soll ich wissen",
      "Instagramshops machen es Abmahnanwälten leicht",
      "Ich bin der Ansicht, abwarten und Tee trinken.",
      "Danke für dein Feedback. Auch zum Look meiner Seite."],
     ["Diese Geschichte teilen", "Diese Website verwendet Akismet, um Spam zu reduzieren."]),
    ("womencantalksports.com.top10.html",
     "http://www.womencantalksports.com/top-10-women-talking-sports/",
     ["Keep Talking Sports!", "3.Charlotte Jones Anderson"],
     ["Category: Blog Popular", "Copyright Women Can Talk Sports.",
      "Submit your sports question below"]),
    ("plentylife.blogspot.pamela-reif.html",
     "https://plentylife.blogspot.com/2017/05/strong-beautiful-pamela-reif-rezension.html",
     ["Schönheit kommt für Pamela von Innen und Außen",
      "Die Workout Übungen kannte ich bereits",
      "Great post, I like your blog"],
     ["Links zu diesem Post", "mehr über mich ♥",
      "Bitte beachte auch die Datenschutzerklärung von Google."]),
    ("luxuriousmagazine.com.polo.html",
     "https://www.luxuriousmagazine.com/2019/06/royal-salute-polo-rome/",
     ["Argentina, the birthplace of polo.",
      "Simon Wittenberg travels to the Eternal City in Italy"],
     ["Luxury and lifestyle articles", "Pinterest"]),
]


def test_exotic_tags():
    # trafilatura_test.go:89-92
    result = _extract_mock("exotic_tags.html", "http://exotic_tags")
    assert "Teletype text" in result.content_text
    assert "My new car is silver." in result.content_text


def _extract_mock(fname: str, url: str):
    with open(os.path.join(MOCK_DIR, fname), "rb") as f:
        html = f.read()
    return extract(html, Options(original_url=url, enable_fallback=True))


@pytest.mark.parametrize("fname,url,withs,withouts", CASES, ids=[c[0] for c in CASES])
def test_realworld(fname, url, withs, withouts):
    result = _extract_mock(fname, url)
    text = result.content_text + " ||| " + result.comments_text
    for marker in withs:
        assert marker in text, f"missing marker: {marker!r}"
    for marker in withouts:
        assert marker not in text, f"unexpected marker: {marker!r}"
