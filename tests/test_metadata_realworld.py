"""Metadata parity on real-world pages from the reference mock corpus.

Transcribed from /root/reference/metadata-realworld_test.go:32-120
(first batch of pages; field-by-field expectations).
"""

import os

import pytest

from go_trafilatura_spark import etree
from go_trafilatura_spark.metadata import extract_metadata
from go_trafilatura_spark.options import Options

MOCK_DIR = "/root/reference/test-files/mock"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(MOCK_DIR), reason="reference mock corpus not available"
)


def meta_for(fname: str, url: str):
    with open(os.path.join(MOCK_DIR, fname), "rb") as f:
        doc = etree.parse_html(f.read())
    return extract_metadata(doc, Options(original_url=url))


def test_blog_python_org():
    url = "http://blog.python.org/2016/12/python-360-is-now-available.html"
    m = meta_for("blog.python.org.html", url)
    assert m.title == "Python 3.6.0 is now available!"
    assert m.description == (
        "Python 3.6.0 is now available! Python 3.6.0 is the newest major "
        "release of the Python language, and it contains many new features "
        "and opti..."
    )
    assert m.author == "Ned Deily"
    assert m.url == url
    assert m.sitename == "blog.python.org"


def test_wordpress_diverse():
    url = "https://en.blog.wordpress.com/2019/06/19/want-to-see-a-more-diverse-wordpress-contributor-community-so-do-we/"
    m = meta_for("blog.wordpress.com.diverse.html", url)
    assert m.title == "Want to See a More Diverse WordPress Contributor Community? So Do We."
    assert m.description == (
        "More diverse speakers at WordCamps means a more diverse community "
        "contributing to WordPress — and that results in better software for everyone."
    )
    assert m.sitename == "The WordPress.com Blog"
    assert m.url == url


def test_creativecommons_about():
    url = "https://creativecommons.org/about/"
    m = meta_for("creativecommons.org.html", url)
    assert m.title == "What we do - Creative Commons"
    assert m.sitename == "Creative Commons"
    assert m.url == url


def test_creativecommons_at():
    url = "https://www.creativecommons.at/faircoin-hackathon"
    m = meta_for("creativecommons.at.faircoin.html", url)
    assert m.title == "FairCoin hackathon beim Sommercamp"


def test_netzpolitik():
    url = "https://netzpolitik.org/2016/die-cider-connection-abmahnungen-gegen-nutzer-von-creative-commons-bildern/"
    m = meta_for("netzpolitik.org.abmahnungen.html", url)
    assert m.title == "Die Cider Connection: Abmahnungen gegen Nutzer von Creative-Commons-Bildern"
    assert m.author == "Markus Reuter"
    assert m.description == (
        "Seit Dezember 2015 verschickt eine Cider Connection zahlreiche "
        "Abmahnungen wegen fehlerhafter Creative-Commons-Referenzierungen. "
        "Wir haben recherchiert und legen jetzt das Netzwerk der Abmahner offen."
    )
    assert m.sitename == "netzpolitik.org"
    assert m.url == url


def test_befifty():
    url = "https://www.befifty.de/home/2017/7/12/unter-uns-montauk"
    m = meta_for("befifty.montauk.html", url)
    assert m.title == "Das vielleicht schönste Ende der Welt: Montauk"
    assert m.author == "Beate Finken"
    assert m.sitename == "BeFifty"
    assert m.categories == ["Travel", "Amerika"]
    assert m.url == url


def test_soundofscience():
    url = "https://www.soundofscience.fr/1927"
    m = meta_for("soundofscience.fr.1927.html", url)
    assert m.title == "Une candidature collective à la présidence du HCERES"
    assert m.author == "Martin Clavey"
    assert m.description.startswith("En réaction à la candidature du conseiller recherche")
    assert m.sitename == "The Sound Of Science"
    assert m.categories == ["Politique scientifique française"]
    assert m.tags == ["évaluation", "HCERES"]
    assert m.url == url


def test_laviedesidees():
    url = "https://laviedesidees.fr/L-evaluation-et-les-listes-de.html"
    m = meta_for("laviedesidees.fr.evaluation.html", url)
    assert m.title == "L’évaluation et les listes de revues"
    assert m.author == "Florence Audier"
    assert m.description.startswith("L'évaluation, et la place")
    assert m.sitename == "La Vie des idées"
    assert m.tags == []
    assert m.url == "http://www.laviedesidees.fr/L-evaluation-et-les-listes-de.html"


def test_theguardian():
    url = "https://www.theguardian.com/education/2020/jan/20/thousands-of-uk-academics-treated-as-second-class-citizens"
    m = meta_for("theguardian.com.academics.html", url)
    assert m.title == "Thousands of UK academics 'treated as second-class citizens'"
    assert m.author == "Richard Adams"
    assert m.description.startswith("Report claims higher education institutions")
    assert m.sitename == "The Guardian"
    assert m.categories == ["Education"]
    assert "Higher education" in m.tags
    assert m.url == "http://www.theguardian.com/education/2020/jan/20/thousands-of-uk-academics-treated-as-second-class-citizens"


def test_phys_org():
    url = "https://phys.org/news/2019-10-flint-flake-tool-partially-birch.html"
    m = meta_for("phys.org.tool.html", url)
    assert m.title == "Flint flake tool partially covered by birch tar adds to evidence of Neanderthal complex thinking"
    assert m.author == "Bob Yirka"
    assert m.sitename == "Phys.org"
    assert m.tags == [
        "Science", "Physics News", "Science news", "Technology News",
        "Physics", "Materials", "Nanotech", "Technology",
    ]
