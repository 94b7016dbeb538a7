"""Publisher rule registry.

The registry is a plain dict ``publisher_key -> PublisherSpec`` —
picklable, broadcastable to executors (compiled selectors are
pure-Python objects). Equivalent role to the reference's
``PublisherCollection`` / ``parser_mapping``
(``src/fundus/scraping/scraper.py:35``), minus the metaclass machinery.
"""

from __future__ import annotations

from typing import Dict, Optional

from ..kernel import PublisherSpec
from .abc_es import ABC_ES
from .afp_faktencheck import AFP_FAKTENCHECK
from .ap_news import AP_NEWS
from .asahi_shimbun import ASAHI_SHIMBUN
from .mainichi_shimbun import MAINICHI_SHIMBUN
from .nikkan_geadai import NIKKAN_GEADAI
from .nikkei import NIKKEI
from .sankei_shimbun import SANKEI_SHIMBUN
from .the_japan_news import THE_JAPAN_NEWS
from .tokyo_chunichi_shimbun import CHUNICHI_SHIMBUN, TOKYO_SHIMBUN
from .yomiuri_shimbun import YOMIURI_SHIMBUN
from .daily_maverick import DAILY_MAVERICK
from .dizindaba import DIZINDABA
from .eyethu_news import EYETHU_NEWS
from .ilanga import ILANGA
from .independent_online import DURBAN_LOCAL, ISOLEZWE, ISOLEZWE_LESIXHOSA
from .the_citizen import THE_CITIZEN
from .times_live import TIMES_LIVE
from .dagbladet import DAGBLADET
from .nettavisen import NETTAVISEN
from .nrk import NRK
from .verdensgang import VERDENS_GANG
from .anadolu_ajansi import ANADOLU_AJANSI
from .haberturk import HABERTURK
from .nine_news import NINE_NEWS
from .ntvtr import NTVTR
from .west_australian import WEST_AUSTRALIAN
from .aftonbladet import AFTONBLADET
from .daily_news_tz import DAILY_NEWS_TZ, HABARI_LEO
from .expressen import EXPRESSEN
from .luxemburger_wort import LUXEMBURGER_WORT
from .nieuwsblad import NIEUWSBLAD
from .politico_eu import POLITICO_EU
from .tageblatt import TAGEBLATT
from .bhaskar import BHASKAR
from .times_of_india import TIMES_OF_INDIA
from .hankook_ilbo import HANKOOK_ILBO
from .mbn import MBN
from .jyllands_posten import JYLLANDS_POSTEN
from .media_indonesia import MEDIA_INDONESIA
from .people import PEOPLE
from .sermitsiaq import SERMITSIAQ
from .seznam_zpravy import SEZNAM_ZPRAVY
from .israel_nachrichten import ISRAEL_NACHRICHTEN
from .landesspiegel import LANDESSPIEGEL
from .lbc_group import LBC_GROUP
from .lesotho_times import LESOTHO_TIMES
from .morgunbladid import MORGUNBLADID
from .lrt import LRT
from .malay_mail import MALAY_MAIL
from .mexico_news_daily import MEXICO_NEWS_DAILY
from .rzeczpospolita import RZECZPOSPOLITA
from .the_namibian import THE_NAMIBIAN
from .kommersant import KOMMERSANT
from .pravda import PRAVDA
from .taipei_times import TAIPEI_TIMES
from .the_portugal_news import THE_PORTUGAL_NEWS
from .vnexpress import VNEXPRESS
from .wochenblatt import WOCHENBLATT
from .die_presse import DIE_PRESSE
from .kleine_zeitung import KLEINE_ZEITUNG
from .mallorca_magazin import MALLORCA_MAGAZIN
from .mallorca_zeitung import MALLORCA_ZEITUNG
from .salzburger_nachrichten import SALZBURGER_NACHRICHTEN
from .berliner_zeitung import BERLINER_ZEITUNG
from .bild import BILD
from .boersenzeitung import BOERSEN_ZEITUNG
from .br import BR
from .business_insider import BUSINESS_INSIDER
from .business_insider_de import BUSINESS_INSIDER_DE
from .canada_com import CANADA_COM
from .cbc_news import CBC_NEWS
from .financial_post import FINANCIAL_POST
from .global_news import GLOBAL_NEWS
from .globe_and_mail import THE_GLOBE_AND_MAIL
from .national_post import NATIONAL_POST
from .ottawa_citizen import OTTAWA_CITIZEN
from .the_province import THE_PROVINCE
from .cnbc import CNBC
from .corriere_della_sera import CORRIERE_DELLA_SERA
from .correctiv import CORRECTIV
from .daily_mail import DAILY_MAIL
from .der_freitag import DER_FREITAG
from .derstandard import DERSTANDARD
from .daily_star import DAILY_STAR
from .die_welt import DIE_WELT
from .die_zeit import DIE_ZEIT
from .dw import DW
from .el_diario import EL_DIARIO
from .el_mundo import EL_MUNDO
from .el_pais import EL_PAIS
from .euronews import EURONEWS
from .evening_standard import EVENING_STANDARD
from .express import EXPRESS
from .faz import FAZ
from .focus import FOCUS
from .fox_news import FOX_NEWS
from .freiepresse import FREIE_PRESSE
from .free_beacon import FREE_BEACON
from .funke import FUNKE
from .frankfurter_rundschau import FRANKFURTER_RUNDSCHAU
from .gamestar import GAMESTAR
from .generic import GENERIC
from .synthetic_rich import RICH
from .golem import GOLEM
from .heise import HEISE
from .hessenschau import HESSENSCHAU
from .i_news import I_NEWS
from .il_giornale import IL_GIORNALE
from .junge_welt import JUNGE_WELT
from .kicker import KICKER
from .klassegegenklasse import KLASSE_GEGEN_KLASSE
from .krautreporter import KRAUTREPORTER
from .la_repubblica import LA_REPUBBLICA
from .la_vanguardia import LA_VANGUARDIA
from .la_times import LA_TIMES
from .le_figaro import LE_FIGARO
from .le_monde import LE_MONDE
from .les_echos import LES_ECHOS
from .lto import LTO
from .mdr import MDR
from .merkur import MERKUR
from .motorsport_magazin import MOTORSPORT_MAGAZIN
from .mz import MITTELDEUTSCHE_ZEITUNG
from .nature import NATURE
from .ndr import NDR
from .netzpolitik_org import NETZPOLITIK_ORG
from .ntv import NTV
from .nzz import NZZ
from .occupy_democrats import OCCUPY_DEMOCRATS
from .orf import ORF
from .postillon import POSTILLON
from .publico import PUBLICO
from .spon import SPON
from .sportschau import SPORTSCHAU
from .srf import SRF
from .stern import STERN
from .stuttgarter_zeitung import STUTTGARTER_ZEITUNG
from .sz import SZ
from .t_online import T_ONLINE
from .tages_anzeiger import TAGES_ANZEIGER
from .tagesschau import TAGESSCHAU
from .tageszeitung import TAGESZEITUNG
from .tagesspiegel import TAGESSPIEGEL
from .taz import TAZ
from .metro import METRO
from .the_nation import THE_NATION
from .the_new_yorker import THE_NEW_YORKER
from .rbb24 import RBB24
from .rheinische_post import RHEINISCHE_POST
from .rest_of_world import REST_OF_WORLD
from .reuters import REUTERS
from .rn import RUHR_NACHRICHTEN
from .rolling_stone import ROLLING_STONE
from .techcrunch import TECHCRUNCH
from .techradar import TECHRADAR
from .the_bbc import THE_BBC
from .the_gateway_pundit import THE_GATEWAY_PUNDIT
from .the_guardian import THE_GUARDIAN
from .the_independent import THE_INDEPENDENT
from .the_mirror import THE_MIRROR
from .the_sun import THE_SUN
from .the_telegraph import THE_TELEGRAPH
from .the_intercept import THE_INTERCEPT
from .voice_of_america import VOICE_OF_AMERICA
from .vogue_de import VOGUE_DE
from .washington_times import WASHINGTON_TIMES
from .washington_post import WASHINGTON_POST
from .waz import WAZ
from .wdr import WDR
from .winfuture import WINFUTURE
from .wired import WIRED
from .world_truth import WORLD_TRUTH
from .zdf import ZDF
from .zwanzig_minuten import ZWANZIG_MINUTEN

REGISTRY: Dict[str, PublisherSpec] = {
    spec.key: spec
    for spec in (
        ABC_ES,
        AFP_FAKTENCHECK,
        AP_NEWS,
        ASAHI_SHIMBUN,
        MAINICHI_SHIMBUN,
        NIKKAN_GEADAI,
        NIKKEI,
        SANKEI_SHIMBUN,
        THE_JAPAN_NEWS,
        TOKYO_SHIMBUN,
        CHUNICHI_SHIMBUN,
        YOMIURI_SHIMBUN,
        DAILY_MAVERICK,
        DIZINDABA,
        EYETHU_NEWS,
        ILANGA,
        DURBAN_LOCAL,
        ISOLEZWE,
        ISOLEZWE_LESIXHOSA,
        THE_CITIZEN,
        TIMES_LIVE,
        DAGBLADET,
        NETTAVISEN,
        NRK,
        VERDENS_GANG,
        ANADOLU_AJANSI,
        HABERTURK,
        NINE_NEWS,
        NTVTR,
        WEST_AUSTRALIAN,
        AFTONBLADET,
        DAILY_NEWS_TZ,
        HABARI_LEO,
        EXPRESSEN,
        LUXEMBURGER_WORT,
        NIEUWSBLAD,
        POLITICO_EU,
        TAGEBLATT,
        BHASKAR,
        TIMES_OF_INDIA,
        HANKOOK_ILBO,
        MBN,
        JYLLANDS_POSTEN,
        MEDIA_INDONESIA,
        PEOPLE,
        SERMITSIAQ,
        SEZNAM_ZPRAVY,
        ISRAEL_NACHRICHTEN,
        LANDESSPIEGEL,
        LBC_GROUP,
        LESOTHO_TIMES,
        MORGUNBLADID,
        LRT,
        MALAY_MAIL,
        MEXICO_NEWS_DAILY,
        RZECZPOSPOLITA,
        THE_NAMIBIAN,
        KOMMERSANT,
        PRAVDA,
        TAIPEI_TIMES,
        THE_PORTUGAL_NEWS,
        VNEXPRESS,
        WOCHENBLATT,
        DIE_PRESSE,
        KLEINE_ZEITUNG,
        MALLORCA_MAGAZIN,
        MALLORCA_ZEITUNG,
        SALZBURGER_NACHRICHTEN,
        BERLINER_ZEITUNG,
        BILD,
        BOERSEN_ZEITUNG,
        BR,
        BUSINESS_INSIDER,
        BUSINESS_INSIDER_DE,
        CANADA_COM,
        CBC_NEWS,
        FINANCIAL_POST,
        GLOBAL_NEWS,
        THE_GLOBE_AND_MAIL,
        NATIONAL_POST,
        OTTAWA_CITIZEN,
        THE_PROVINCE,
        CNBC,
        CORRIERE_DELLA_SERA,
        CORRECTIV,
        DAILY_MAIL,
        DER_FREITAG,
        DERSTANDARD,
        DAILY_STAR,
        DIE_WELT,
        DIE_ZEIT,
        DW,
        EL_DIARIO,
        EL_MUNDO,
        EL_PAIS,
        EURONEWS,
        EVENING_STANDARD,
        EXPRESS,
        FAZ,
        FOCUS,
        FOX_NEWS,
        FREIE_PRESSE,
        FREE_BEACON,
        FUNKE,
        FRANKFURTER_RUNDSCHAU,
        GAMESTAR,
        GOLEM,
        HEISE,
        HESSENSCHAU,
        JUNGE_WELT,
        KICKER,
        I_NEWS,
        IL_GIORNALE,
        KLASSE_GEGEN_KLASSE,
        KRAUTREPORTER,
        LA_REPUBBLICA,
        LA_VANGUARDIA,
        LA_TIMES,
        LE_FIGARO,
        LE_MONDE,
        LES_ECHOS,
        LTO,
        MDR,
        MERKUR,
        MOTORSPORT_MAGAZIN,
        MITTELDEUTSCHE_ZEITUNG,
        NATURE,
        NDR,
        NETZPOLITIK_ORG,
        NTV,
        NZZ,
        OCCUPY_DEMOCRATS,
        ORF,
        POSTILLON,
        PUBLICO,
        SPON,
        SPORTSCHAU,
        SRF,
        STERN,
        STUTTGARTER_ZEITUNG,
        SZ,
        T_ONLINE,
        TAGES_ANZEIGER,
        TAGESSCHAU,
        TAGESZEITUNG,
        TAGESSPIEGEL,
        TAZ,
        METRO,
        THE_NATION,
        THE_NEW_YORKER,
        RBB24,
        RHEINISCHE_POST,
        REST_OF_WORLD,
        REUTERS,
        RUHR_NACHRICHTEN,
        ROLLING_STONE,
        TECHCRUNCH,
        TECHRADAR,
        THE_BBC,
        THE_GATEWAY_PUNDIT,
        THE_GUARDIAN,
        THE_INDEPENDENT,
        THE_MIRROR,
        THE_INTERCEPT,
        THE_SUN,
        THE_TELEGRAPH,
        VOGUE_DE,
        VOICE_OF_AMERICA,
        WASHINGTON_TIMES,
        WASHINGTON_POST,
        WAZ,
        WDR,
        WINFUTURE,
        WIRED,
        WORLD_TRUTH,
        ZDF,
        ZWANZIG_MINUTEN,
        GENERIC,
        RICH,
    )
}

# Euronews is a shared multi-tenant parser in the reference
# (src/fundus/publishers/shared/euronews.py) — alias the per-country
# publisher keys used by the golden corpus onto the same spec.
for _alias in ("uk.EuronewsEN", "de.EuronewsDE", "fr.EuronewsFR"):
    REGISTRY[_alias] = PublisherSpec(key=_alias, versions=EURONEWS.versions)

# Funke Mediengruppe tenants share one parser in the reference
# (src/fundus/publishers/de/funke.py)
for _alias in ("de.BerlinerMorgenpost", "de.HamburgerAbendblatt", "de.BSZ"):
    REGISTRY[_alias] = PublisherSpec(key=_alias, versions=FUNKE.versions)


def resolve(publisher_key: Optional[str]) -> PublisherSpec:
    if publisher_key and publisher_key in REGISTRY:
        return REGISTRY[publisher_key]
    return GENERIC


__all__ = ["REGISTRY", "resolve", "AP_NEWS", "EURONEWS", "GENERIC", "GOLEM", "MDR", "REUTERS"]
