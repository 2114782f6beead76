"""MPEG-TS PSI/SI section library (gst-libs/gst/mpegts/) — typed
section objects with parse + packetize, mirroring the GstMpegts API
surface the upstream unit test exercises (tests/check/libs/mpegts.c):

  - Section: the common long/short header
    (_packetize_common_section, gstmpegtssection.c:1124-1177 — note
    ISO tables OR 0x3000 into the length word while DVB tables OR
    0x7000, and the syntax bit is set for long sections);
  - PAT / PMT (ISO 13818-1), NIT / SDT (DVB), ATSC STT and the
    SCTE-35 splice information table, each with from_*/get_* pairs
    that survive a packetize -> re-parse round trip byte-exactly
    against the upstream test vectors;
  - get_* returns None on a bad CRC (the upstream corrupt-CRC
    assertions);
  - descriptors: registration (0x05), DVB network name (0x40) and DVB
    service (0x48) builders/parsers with the 255-byte caps, plus
    find_descriptor / parse_descriptors.
"""

from __future__ import annotations

import dataclasses
import datetime
import struct
from typing import List, Optional, Tuple

from gstbad_tpu.io.mpegts import crc32_mpeg

# table ids
TABLE_ID_PAT = 0x00
TABLE_ID_PMT = 0x02
TABLE_ID_NIT_ACTUAL = 0x40
TABLE_ID_NIT_OTHER = 0x41
TABLE_ID_SDT_ACTUAL = 0x42
TABLE_ID_SDT_OTHER = 0x46
TABLE_ID_ATSC_STT = 0xCD
TABLE_ID_SCTE_SPLICE = 0xFC

# descriptor tags
DESC_REGISTRATION = 0x05
DESC_DVB_NETWORK_NAME = 0x40
DESC_DVB_SERVICE = 0x48

# DVB service types (gstmpegtsdescriptor.h)
DVB_SERVICE_DIGITAL_TELEVISION = 0x01

# running status (gstmpegtssection.h)
RUNNING_STATUS_UNDEFINED = 0
RUNNING_STATUS_NOT_RUNNING = 1
RUNNING_STATUS_STARTS_IN_FEW_SECONDS = 2
RUNNING_STATUS_PAUSING = 3
RUNNING_STATUS_RUNNING = 4
RUNNING_STATUS_OFF_AIR = 5

# SCTE splice commands (gstmpegtssection.h GstMpegtsSCTESpliceCommand)
SCTE_SPLICE_COMMAND_NULL = 0x00
SCTE_SPLICE_COMMAND_SCHEDULE = 0x04
SCTE_SPLICE_COMMAND_INSERT = 0x05
SCTE_SPLICE_COMMAND_TIME = 0x06
SCTE_SPLICE_COMMAND_BANDWIDTH = 0x07
SCTE_SPLICE_COMMAND_PRIVATE = 0xFF

# ISO 13818-1 tables write '001'+length, DVB tables write '011'+length
_ISO_TABLES = {TABLE_ID_PAT, TABLE_ID_PMT, TABLE_ID_SCTE_SPLICE}

_GPS_EPOCH = datetime.datetime(1980, 1, 6, tzinfo=datetime.timezone.utc)


class SiError(ValueError):
    pass


# ---------------------------------------------------------- descriptors

@dataclasses.dataclass
class Descriptor:
    """GstMpegtsDescriptor: tag + payload; data is the FULL descriptor
    bytes (tag, length, payload) like the C struct's data field."""
    tag: int
    length: int
    data: bytes

    @classmethod
    def build(cls, tag: int, payload: bytes) -> "Descriptor":
        return cls(tag=tag, length=len(payload),
                   data=bytes([tag, len(payload)]) + payload)


def descriptor_from_registration(fmt: str, extra: bytes = b""
                                 ) -> Descriptor:
    """gst_mpegts_descriptor_from_registration."""
    payload = fmt.encode("latin1")[:4] + extra
    return Descriptor.build(DESC_REGISTRATION, payload)


def descriptor_from_dvb_network_name(name: str
                                     ) -> Optional[Descriptor]:
    """0x40; NULL when the name exceeds 255 bytes (the upstream
    long-string check)."""
    encoded = name.encode()
    if len(encoded) > 255:
        return None
    return Descriptor.build(DESC_DVB_NETWORK_NAME, encoded)


def descriptor_parse_dvb_network_name(desc: Descriptor
                                      ) -> Optional[str]:
    if desc.tag != DESC_DVB_NETWORK_NAME:
        return None
    return desc.data[2:2 + desc.length].decode("latin1")


def descriptor_from_dvb_service(service_type: int,
                                name: Optional[str] = None,
                                provider: Optional[str] = None
                                ) -> Optional[Descriptor]:
    """0x48: type, provider_len+provider, name_len+name; NULL when
    either string exceeds 255 bytes."""
    name_b = (name or "").encode()
    prov_b = (provider or "").encode()
    if len(name_b) > 255 or len(prov_b) > 255:
        return None
    payload = bytes([service_type, len(prov_b)]) + prov_b \
        + bytes([len(name_b)]) + name_b
    return Descriptor.build(DESC_DVB_SERVICE, payload)


def descriptor_parse_dvb_service(desc: Descriptor
                                 ) -> Optional[Tuple[int, str, str]]:
    """(service_type, name, provider) or None."""
    if desc.tag != DESC_DVB_SERVICE or desc.length < 3:
        return None
    d = desc.data[2:]
    service_type = d[0]
    plen = d[1]
    provider = d[2:2 + plen].decode("latin1")
    nlen = d[2 + plen]
    name = d[3 + plen:3 + plen + nlen].decode("latin1")
    return service_type, name, provider


def parse_descriptors(data: bytes) -> Optional[List[Descriptor]]:
    out = []
    pos = 0
    while pos < len(data):
        if pos + 2 > len(data):
            return None
        tag, length = data[pos], data[pos + 1]
        if pos + 2 + length > len(data):
            return None
        out.append(Descriptor(tag, length,
                              data[pos:pos + 2 + length]))
        pos += 2 + length
    return out


def find_descriptor(descriptors: List[Descriptor], tag: int
                    ) -> Optional[Descriptor]:
    for d in descriptors:
        if d.tag == tag:
            return d
    return None


def _pack_descriptors(descriptors: List[Descriptor]) -> bytes:
    return b"".join(d.data for d in descriptors)


# -------------------------------------------------------------- section

@dataclasses.dataclass
class Section:
    """GstMpegtsSection."""
    pid: int = 0
    table_id: int = 0
    short_section: bool = False
    subtable_extension: int = 0
    version_number: int = 0
    current_next_indicator: bool = True
    section_number: int = 0
    last_section_number: int = 0
    data: bytes = b""
    _payload: object = None  # the typed table object, pre-packetize

    @property
    def section_length(self) -> int:
        return len(self.data)

    def _header(self, length: int) -> bytes:
        """_packetize_common_section
        (gstmpegtssection.c:1124-1177)."""
        out = bytearray()
        out.append(self.table_id)
        marker = 0x3000 if self.table_id in _ISO_TABLES else 0x7000
        word = (length - 3) | marker
        if not self.short_section:
            word |= 0x8000  # section_syntax_indicator
        out += struct.pack(">H", word)
        if self.short_section:
            return bytes(out)
        out += struct.pack(">H", self.subtable_extension)
        out.append(0xC0 | ((self.version_number & 0x1F) << 1)
                   | (1 if self.current_next_indicator else 0))
        out.append(self.section_number)
        out.append(self.last_section_number)
        return bytes(out)

    def packetize(self) -> bytes:
        """gst_mpegts_section_packetize: build data (cached)."""
        if self.data:
            return self.data
        body = self._payload_bytes()
        length = (3 if self.short_section else 8) + len(body) + 4
        head = self._header(length)
        crc_input = head + body
        crc = crc32_mpeg(crc_input)
        self.data = crc_input + struct.pack(">I", crc)
        return self.data

    def _payload_bytes(self) -> bytes:
        builder = _PACKETIZERS.get(type(self._payload))
        if builder is None:
            raise SiError("no packetizer for this section")
        return builder(self._payload)

    # -- typed getters (None on bad CRC, like the upstream test) ------

    def _checked_body(self) -> Optional[bytes]:
        if not self.data:
            self.packetize()
        if crc32_mpeg(self.data) != 0:
            return None  # bad CRC
        start = 3 if self.short_section else 8
        return self.data[start:-4]

    def get_pat(self):
        if self.table_id != TABLE_ID_PAT:
            return None
        body = self._checked_body()
        if body is None:
            return None
        return _parse_pat(body)

    def get_pmt(self):
        if self.table_id != TABLE_ID_PMT:
            return None
        body = self._checked_body()
        if body is None:
            return None
        return _parse_pmt(self, body)

    def get_nit(self):
        if self.table_id not in (TABLE_ID_NIT_ACTUAL,
                                 TABLE_ID_NIT_OTHER):
            return None
        body = self._checked_body()
        if body is None:
            return None
        return _parse_nit(self, body)

    def get_sdt(self):
        if self.table_id not in (TABLE_ID_SDT_ACTUAL,
                                 TABLE_ID_SDT_OTHER):
            return None
        body = self._checked_body()
        if body is None:
            return None
        return _parse_sdt(self, body)

    def get_atsc_stt(self):
        if self.table_id != TABLE_ID_ATSC_STT:
            return None
        body = self._checked_body()
        if body is None:
            return None
        return _parse_stt(body)

    def get_scte_sit(self):
        if self.table_id != TABLE_ID_SCTE_SPLICE:
            return None
        if self._payload is not None and not self.data:
            return self._payload
        if not self.data or crc32_mpeg(self.data) != 0:
            return None
        return _parse_sit(self.data)


def section_new(pid: int, data: bytes) -> Section:
    """gst_mpegts_section_new: wrap raw section bytes."""
    if len(data) < 3:
        raise SiError("section too short")
    s = Section(pid=pid, table_id=data[0])
    s.short_section = not (data[1] & 0x80)
    if not s.short_section and len(data) >= 8:
        s.subtable_extension = struct.unpack_from(">H", data, 3)[0]
        s.version_number = (data[5] >> 1) & 0x1F
        s.current_next_indicator = bool(data[5] & 1)
        s.section_number = data[6]
        s.last_section_number = data[7]
    s.data = bytes(data)
    return s


# ------------------------------------------------------------------ PAT

@dataclasses.dataclass
class PatProgram:
    program_number: int = 0
    network_or_program_map_PID: int = 0


def _parse_pat(body: bytes) -> Optional[List[PatProgram]]:
    if len(body) % 4:
        return None
    out = []
    for off in range(0, len(body), 4):
        prog, pid = struct.unpack_from(">HH", body, off)
        out.append(PatProgram(prog, pid & 0x1FFF))
    return out


def _pack_pat(programs: List[PatProgram]) -> bytes:
    out = bytearray()
    for p in programs:
        out += struct.pack(">HH", p.program_number,
                           0xE000 | p.network_or_program_map_PID)
    return bytes(out)


def section_from_pat(programs: List[PatProgram],
                     ts_id: int) -> Section:
    s = Section(pid=0x00, table_id=TABLE_ID_PAT,
                subtable_extension=ts_id)
    s._payload = _PatWrap(programs)
    return s


@dataclasses.dataclass
class _PatWrap:
    programs: List[PatProgram]


# ------------------------------------------------------------------ PMT

@dataclasses.dataclass
class PmtStream:
    stream_type: int = 0
    pid: int = 0
    descriptors: List[Descriptor] = dataclasses.field(
        default_factory=list)


@dataclasses.dataclass
class Pmt:
    pcr_pid: int = 0x1FFF
    program_number: int = 0
    descriptors: List[Descriptor] = dataclasses.field(
        default_factory=list)
    streams: List[PmtStream] = dataclasses.field(default_factory=list)


def _parse_pmt(section: Section, body: bytes) -> Optional[Pmt]:
    if len(body) < 4:
        return None
    pmt = Pmt()
    pmt.program_number = section.subtable_extension
    pmt.pcr_pid = struct.unpack_from(">H", body, 0)[0] & 0x1FFF
    info_len = struct.unpack_from(">H", body, 2)[0] & 0xFFF
    pos = 4
    descs = parse_descriptors(body[pos:pos + info_len])
    if descs is None:
        return None
    pmt.descriptors = descs
    pos += info_len
    while pos < len(body):
        if pos + 5 > len(body):
            return None
        st = PmtStream()
        st.stream_type = body[pos]
        st.pid = struct.unpack_from(">H", body, pos + 1)[0] & 0x1FFF
        es_len = struct.unpack_from(">H", body, pos + 3)[0] & 0xFFF
        pos += 5
        descs = parse_descriptors(body[pos:pos + es_len])
        if descs is None:
            return None
        st.descriptors = descs
        pos += es_len
        pmt.streams.append(st)
    return pmt


def _pack_pmt(pmt: Pmt) -> bytes:
    out = bytearray()
    out += struct.pack(">H", 0xE000 | pmt.pcr_pid)
    info = _pack_descriptors(pmt.descriptors)
    out += struct.pack(">H", 0xF000 | len(info))
    out += info
    for st in pmt.streams:
        es = _pack_descriptors(st.descriptors)
        out.append(st.stream_type)
        out += struct.pack(">H", 0xE000 | st.pid)
        out += struct.pack(">H", 0xF000 | len(es))
        out += es
    return bytes(out)


def section_from_pmt(pmt: Pmt, pid: int) -> Section:
    s = Section(pid=pid, table_id=TABLE_ID_PMT,
                subtable_extension=pmt.program_number)
    s._payload = pmt
    return s


# ------------------------------------------------------------------ NIT

@dataclasses.dataclass
class NitStream:
    transport_stream_id: int = 0
    original_network_id: int = 0
    descriptors: List[Descriptor] = dataclasses.field(
        default_factory=list)


@dataclasses.dataclass
class Nit:
    actual_network: bool = True
    network_id: int = 0
    descriptors: List[Descriptor] = dataclasses.field(
        default_factory=list)
    streams: List[NitStream] = dataclasses.field(default_factory=list)


def _parse_nit(section: Section, body: bytes) -> Optional[Nit]:
    if len(body) < 2:
        return None
    nit = Nit()
    nit.actual_network = section.table_id == TABLE_ID_NIT_ACTUAL
    nit.network_id = section.subtable_extension
    net_len = struct.unpack_from(">H", body, 0)[0] & 0xFFF
    pos = 2
    descs = parse_descriptors(body[pos:pos + net_len])
    if descs is None:
        return None
    nit.descriptors = descs
    pos += net_len
    if pos + 2 > len(body):
        return None
    loop_len = struct.unpack_from(">H", body, pos)[0] & 0xFFF
    pos += 2
    end = pos + loop_len
    while pos < end:
        if pos + 6 > len(body):
            return None
        st = NitStream()
        st.transport_stream_id, st.original_network_id = \
            struct.unpack_from(">HH", body, pos)
        d_len = struct.unpack_from(">H", body, pos + 4)[0] & 0xFFF
        pos += 6
        descs = parse_descriptors(body[pos:pos + d_len])
        if descs is None:
            return None
        st.descriptors = descs
        pos += d_len
        nit.streams.append(st)
    return nit


def _pack_nit(nit: Nit) -> bytes:
    out = bytearray()
    net = _pack_descriptors(nit.descriptors)
    out += struct.pack(">H", 0xF000 | len(net))
    out += net
    loop = bytearray()
    for st in nit.streams:
        descs = _pack_descriptors(st.descriptors)
        loop += struct.pack(">HH", st.transport_stream_id,
                            st.original_network_id)
        loop += struct.pack(">H", 0xF000 | len(descs))
        loop += descs
    out += struct.pack(">H", 0xF000 | len(loop))
    out += loop
    return bytes(out)


def section_from_nit(nit: Nit) -> Section:
    s = Section(pid=0x10,
                table_id=(TABLE_ID_NIT_ACTUAL if nit.actual_network
                          else TABLE_ID_NIT_OTHER),
                subtable_extension=nit.network_id)
    s._payload = nit
    return s


# ------------------------------------------------------------------ SDT

@dataclasses.dataclass
class SdtService:
    service_id: int = 0
    EIT_schedule_flag: bool = False
    EIT_present_following_flag: bool = False
    running_status: int = RUNNING_STATUS_UNDEFINED
    free_CA_mode: bool = False
    descriptors: List[Descriptor] = dataclasses.field(
        default_factory=list)


@dataclasses.dataclass
class Sdt:
    actual_ts: bool = True
    transport_stream_id: int = 0
    original_network_id: int = 0
    services: List[SdtService] = dataclasses.field(
        default_factory=list)


def _parse_sdt(section: Section, body: bytes) -> Optional[Sdt]:
    if len(body) < 3:
        return None
    sdt = Sdt()
    sdt.actual_ts = section.table_id == TABLE_ID_SDT_ACTUAL
    sdt.transport_stream_id = section.subtable_extension
    sdt.original_network_id = struct.unpack_from(">H", body, 0)[0]
    pos = 3  # 1 reserved byte
    while pos < len(body):
        if pos + 5 > len(body):
            return None
        svc = SdtService()
        svc.service_id = struct.unpack_from(">H", body, pos)[0]
        flags = body[pos + 2]
        svc.EIT_schedule_flag = bool(flags & 0x02)
        svc.EIT_present_following_flag = bool(flags & 0x01)
        word = struct.unpack_from(">H", body, pos + 3)[0]
        svc.running_status = word >> 13
        svc.free_CA_mode = bool(word & 0x1000)
        d_len = word & 0xFFF
        pos += 5
        descs = parse_descriptors(body[pos:pos + d_len])
        if descs is None:
            return None
        svc.descriptors = descs
        pos += d_len
        sdt.services.append(svc)
    return sdt


def _pack_sdt(sdt: Sdt) -> bytes:
    out = bytearray()
    out += struct.pack(">H", sdt.original_network_id)
    out.append(0xFF)  # reserved
    for svc in sdt.services:
        descs = _pack_descriptors(svc.descriptors)
        out += struct.pack(">H", svc.service_id)
        out.append(0xFC | (0x02 if svc.EIT_schedule_flag else 0)
                   | (0x01 if svc.EIT_present_following_flag else 0))
        out += struct.pack(
            ">H", (svc.running_status << 13)
            | (0x1000 if svc.free_CA_mode else 0) | len(descs))
        out += descs
    return bytes(out)


def section_from_sdt(sdt: Sdt) -> Section:
    s = Section(pid=0x11,
                table_id=(TABLE_ID_SDT_ACTUAL if sdt.actual_ts
                          else TABLE_ID_SDT_OTHER),
                subtable_extension=sdt.transport_stream_id)
    s._payload = sdt
    return s


# ------------------------------------------------------------- ATSC STT

@dataclasses.dataclass
class AtscStt:
    protocol_version: int = 0
    system_time: int = 0
    gps_utc_offset: int = 0
    ds_status: int = 0
    ds_dayofmonth: int = 0
    ds_hour: int = 0

    def datetime_utc(self) -> datetime.datetime:
        """gst_mpegts_atsc_stt_get_datetime_utc: GPS epoch
        (1980-01-06) + system_time - gps_utc_offset."""
        return _GPS_EPOCH + datetime.timedelta(
            seconds=self.system_time - self.gps_utc_offset)


def _parse_stt(body: bytes) -> Optional[AtscStt]:
    if len(body) < 8:
        return None
    stt = AtscStt()
    stt.protocol_version = body[0]
    stt.system_time = struct.unpack_from(">I", body, 1)[0]
    stt.gps_utc_offset = body[5]
    daylight = struct.unpack_from(">H", body, 6)[0]
    stt.ds_status = daylight >> 15
    stt.ds_dayofmonth = (daylight >> 8) & 0x1F
    stt.ds_hour = daylight & 0xFF
    return stt


# ------------------------------------------------------------- SCTE SIT

@dataclasses.dataclass
class ScteSpliceEvent:
    insert_event: bool = False
    splice_event_id: int = 0
    splice_event_cancel_indicator: bool = False
    out_of_network_indicator: bool = False
    # non-0 default, like gst_mpegts_scte_splice_event_new
    program_splice_flag: bool = True
    duration_flag: bool = False
    splice_immediate_flag: bool = False
    program_splice_time_specified: bool = False
    program_splice_time: int = 0
    break_duration_auto_return: bool = False
    break_duration: int = 0
    unique_program_id: int = 0
    avail_num: int = 0
    avails_expected: int = 0


@dataclasses.dataclass
class ScteSit:
    encrypted_packet: bool = False
    encryption_algorithm: int = 0
    pts_adjustment: int = 0
    cw_index: int = 0
    tier: int = 0
    splice_command_length: int = 0
    splice_command_type: int = SCTE_SPLICE_COMMAND_NULL
    splice_time_specified: bool = False
    splice_time: int = 0
    splices: List[ScteSpliceEvent] = dataclasses.field(
        default_factory=list)
    descriptors: List[Descriptor] = dataclasses.field(
        default_factory=list)


def _parse_splice_event(data: bytes, pos: int, insert_event: bool
                        ) -> Optional[Tuple[ScteSpliceEvent, int]]:
    """_parse_slice_event (gst-scte-section.c:59-140)."""
    ev = ScteSpliceEvent(insert_event=insert_event)
    if pos + 5 > len(data):
        return None
    ev.splice_event_id = struct.unpack_from(">I", data, pos)[0]
    pos += 4
    ev.splice_event_cancel_indicator = bool(data[pos] >> 7)
    pos += 1
    if not ev.splice_event_cancel_indicator:
        if pos + 5 > len(data):
            return None
        b = data[pos]
        ev.out_of_network_indicator = bool(b >> 7)
        ev.program_splice_flag = bool((b >> 6) & 1)
        ev.duration_flag = bool((b >> 5) & 1)
        ev.splice_immediate_flag = bool((b >> 4) & 1)
        pos += 1
        if not ev.program_splice_flag:
            return None  # component splices unsupported
        if not ev.splice_immediate_flag:
            ev.program_splice_time_specified = bool(data[pos] >> 7)
            if ev.program_splice_time_specified:
                ev.program_splice_time = (data[pos] & 1) << 32
                pos += 1
                ev.program_splice_time += \
                    struct.unpack_from(">I", data, pos)[0]
                pos += 4
            else:
                pos += 1
        if ev.duration_flag:
            ev.break_duration_auto_return = bool(data[pos] >> 7)
            ev.break_duration = (data[pos] & 1) << 32
            pos += 1
            ev.break_duration += struct.unpack_from(">I", data, pos)[0]
            pos += 4
        ev.unique_program_id = struct.unpack_from(">H", data, pos)[0]
        pos += 2
        ev.avail_num = data[pos]
        ev.avails_expected = data[pos + 1]
        pos += 2
    return ev, pos


def _parse_sit(data: bytes) -> Optional[ScteSit]:
    """_parse_sit (gst-scte-section.c:170-295) over the FULL section
    bytes."""
    sit = ScteSit()
    pos = 3
    if data[pos] != 0:
        return None  # protocol_version must be 0
    pos += 1
    sit.encrypted_packet = bool(data[pos] >> 7)
    sit.encryption_algorithm = data[pos] & 0x3F
    sit.pts_adjustment = (data[pos] & 1) << 32
    pos += 1
    sit.pts_adjustment += struct.unpack_from(">I", data, pos)[0]
    pos += 4
    sit.cw_index = data[pos]
    pos += 1
    tmp = int.from_bytes(data[pos:pos + 3], "big")
    pos += 3
    sit.tier = tmp >> 12
    sit.splice_command_length = tmp & 0xFFF
    if sit.splice_command_length == 0xFFF:  # legacy "undefined"
        sit.splice_command_length = 0
    sit.splice_command_type = data[pos]
    pos += 1
    if sit.splice_command_type in (SCTE_SPLICE_COMMAND_NULL,
                                   SCTE_SPLICE_COMMAND_BANDWIDTH):
        pass
    elif sit.splice_command_type == SCTE_SPLICE_COMMAND_TIME:
        sit.splice_time_specified = bool(data[pos] >> 7)
        if sit.splice_time_specified:
            sit.splice_time = (data[pos] & 1) << 32
            pos += 1
            sit.splice_time += struct.unpack_from(">I", data, pos)[0]
            pos += 4
        else:
            pos += 1
    elif sit.splice_command_type == SCTE_SPLICE_COMMAND_INSERT:
        got = _parse_splice_event(data, pos, True)
        if got is None:
            return None
        ev, pos = got
        sit.splices.append(ev)
    else:
        return None
    desc_len = struct.unpack_from(">H", data, pos)[0]
    pos += 2
    descs = parse_descriptors(data[pos:pos + desc_len])
    if descs is None:
        return None
    sit.descriptors = descs
    pos += desc_len
    if pos != len(data) - 4:
        return None
    return sit


def _pack_sit_body(sit: ScteSit) -> bytes:
    """_packetize_sit body after the 3-byte short header
    (gst-scte-section.c:481-650)."""
    if sit.encrypted_packet:
        raise SiError("SCTE encrypted packet is not supported")
    if sit.splice_command_type in (SCTE_SPLICE_COMMAND_SCHEDULE,
                                   SCTE_SPLICE_COMMAND_TIME,
                                   SCTE_SPLICE_COMMAND_PRIVATE):
        raise SiError("SCTE command not supported")
    events = bytearray()
    for ev in sit.splices:
        events += struct.pack(">I", ev.splice_event_id)
        events.append(0xFF if ev.splice_event_cancel_indicator
                      else 0x7F)
        if not ev.splice_event_cancel_indicator:
            if not ev.program_splice_flag:
                raise SiError("only SCTE program splices supported")
            events.append(
                (ev.out_of_network_indicator << 7)
                | (ev.program_splice_flag << 6)
                | (ev.duration_flag << 5)
                | (ev.splice_immediate_flag << 4) | 0x0F)
            if not ev.splice_immediate_flag:
                if not ev.program_splice_time_specified:
                    events.append(0x7F)
                else:
                    events.append(
                        0xF2 | ((ev.program_splice_time >> 32) & 1))
                    events += struct.pack(
                        ">I", ev.program_splice_time & 0xFFFFFFFF)
            if ev.duration_flag:
                b = 0xFE if ev.break_duration_auto_return else 0x7E
                events.append(b | ((ev.break_duration >> 32) & 1))
                events += struct.pack(">I",
                                      ev.break_duration & 0xFFFFFFFF)
            events += struct.pack(">H", ev.unique_program_id)
            events.append(ev.avail_num)
            events.append(ev.avails_expected)
    descs = _pack_descriptors(sit.descriptors)
    out = bytearray()
    out.append(0)  # protocol version
    out.append((sit.pts_adjustment >> 32) & 1)
    out += struct.pack(">I", sit.pts_adjustment & 0xFFFFFFFF)
    out.append(sit.cw_index)
    tmp = ((sit.tier & 0xFFF) << 12) | (len(events) & 0xFFF)
    out += tmp.to_bytes(3, "big")
    out.append(sit.splice_command_type)
    out += events
    out += struct.pack(">H", len(descs))
    out += descs
    return bytes(out)


def section_from_scte_sit(sit: ScteSit, pid: int) -> Section:
    s = Section(pid=pid, table_id=TABLE_ID_SCTE_SPLICE,
                short_section=True)
    s._payload = sit
    return s


_PACKETIZERS = {
    _PatWrap: lambda w: _pack_pat(w.programs),
    Pmt: _pack_pmt,
    Nit: _pack_nit,
    Sdt: _pack_sdt,
    ScteSit: _pack_sit_body,
}
