"""Tokenizing resource tables.

Python ports of the XML resource tables the reference loads at startup
(reference: [resources]/tokenizing/url-detector-resources.xml — first-level domains and
URI schemes; [resources]/tokenizing/sent-splitter-resources.xml — street-ends lists;
Tokenizer.cs:211-219 — digits-spec-ends). Stored as frozen Python sets; in Spark these are
closure-captured by the pandas UDFs (tiny, <10 KB) — the analog of the reference's
driver-side XML parse + in-memory hash sets (SentSplitterModel.cs:112-156,
UrlDetector.cs:101-129).
"""

from __future__ import annotations

# url-detector-resources.xml <first-level-domains> (commented-out entries excluded: id, nr, st)
FIRST_LEVEL_DOMAINS = frozenset(
    s.upper()
    for s in (
        "ac ad ae aero af ag ai al am an ao aq ar as asia at au aw az ba bb bd be bf bg bh bi "
        "biz bj bm bn bo br bs bt bv bw by bz ca cat cc cd cf cg ch ci ck cl cm cn com co coop "
        "cr cu cv cx cy cz de dj dk dm do dz ec edu ee eg eh er es et eu fi fj fk fm fo fr ga "
        "gb gd ge gf gg gh gi gl gm gn gov gp gq gr gs gt gu gw gy hk hm hn hr ht hu ie il im "
        "in info int io iq ir is it je jm jo jobs jp ke kg kh ki km kn kp kr kw ky kz la lb lc "
        "li lk lr ls lt lu lv ly ma mc md mg mh mil mk ml mm mn mo mobi mp mq mr ms mt mu "
        "museum mv mw mx my mz na name nato nc ne net nf ng ni nl no np nu nz om org pa pe pf "
        "pg ph pk pl pm pn pr pro ps pt pw py qa re ro ru rw sa sb sc sd se sg sh si sj sk sl "
        "sm sn so sr su sv sy sz tc td tel tf tg th tj tk tm tn to tp tr travel tt tv tw tz ua "
        "ug uk um us uy uz va vc ve vg vi vn vu wf ws ye yt yu za zm zw "
        "ру рф нет орг ком"
    ).split()
)
FIRST_LEVEL_DOMAINS_MAX_LENGTH = max(len(s) for s in FIRST_LEVEL_DOMAINS)

# url-detector-resources.xml <uri-schemes> (news commented out in the reference)
URI_SCHEMES = frozenset(
    s.upper()
    for s in (
        "javascript jdbc acap adiumxtra attachment bitcoin chrome chrome-extension "
        "com-eventbrite-attendee cvs dns ed2k facetime file finger fish gizmoproject gopher "
        "http https iax imap irc irc6 ircs jabber jar ldap mailto magnet mms ms-help "
        "ms-settings-power snews nntp rtmp rtsp ftp sftp tftp skype snmp ssh telnet udp uuid "
        "urn ws wss xmpp"
    ).split()
)
URI_SCHEMES_MAX_LENGTH = max(len(s) for s in URI_SCHEMES)

# sent-splitter-resources.xml <streets-ends-as-end-of-complex-words> / <streets-ends-as-separate-words>
STREETS_ENDS_COMPLEX = ("-Allee.", "-Str.", "-Platz.")
STREETS_ENDS_SEPARATE = frozenset({"Allee.", "Str.", "Platz."})

# Tokenizer.cs:211-219 _DigitsSpecEnds (InvariantCultureIgnoreCase — store casefolded)
DIGITS_SPEC_ENDS = frozenset(
    {"г", "г.", "кг", "кг.", "см", "см.", "км", "км.", "тыс", "тыс.", "млн", "млн."}
)

NUM_PLACEHOLDER = "[%NUM%]"  # Tokenizer.cs:197
URL_PLACEHOLDER = "[%URL%]"  # Tokenizer.cs:198
