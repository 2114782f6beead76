"""PSI/SI section library (gst-libs/gst/mpegts) — transcription of the
upstream unit test (tests/check/libs/mpegts.c) including its canned
section byte vectors."""

import pytest

from gstbad_tpu.io import mpegts_si as si

# the upstream packetize check vectors (mpegts.c:26-72)
PAT_DATA = bytes([
    0x00, 0xB0, 0x11, 0x00, 0x00, 0xc1, 0x00,
    0x00, 0x00, 0x00, 0xe0, 0x30, 0x00, 0x01,
    0xe0, 0x31, 0x98, 0xdf, 0x37, 0xc4])
PMT_DATA = bytes([
    0x02, 0xb0, 0x29, 0x00, 0x01, 0xc1, 0x00,
    0x00, 0xff, 0xff, 0xf0, 0x06, 0x05, 0x04,
    0x48, 0x44, 0x4d, 0x56, 0x1b, 0xe0, 0x40,
    0xF0, 0x06, 0x05, 0x04, 0x48, 0x44, 0x4d,
    0x56, 0x1b, 0xe0, 0x41, 0xF0, 0x06, 0x05,
    0x04, 0x48, 0x44, 0x4d, 0x56, 0x15, 0x41,
    0x5f, 0x5b])
NIT_DATA = bytes([
    0x40, 0xf0, 0x49, 0x1f, 0xff, 0xc1, 0x00,
    0x00, 0xf0, 0x0e, 0x40, 0x0c, 0x4e, 0x65,
    0x74, 0x77, 0x6f, 0x72, 0x6b, 0x20, 0x6e,
    0x61, 0x6d, 0x65, 0xf0, 0x2e, 0x1f, 0xff,
    0x1f, 0xfe, 0xf0, 0x11, 0x40, 0x0f, 0x41,
    0x6e, 0x6f, 0x74, 0x68, 0x65, 0x72, 0x20,
    0x6e, 0x65, 0x74, 0x77, 0x6f, 0x72, 0x6b,
    0x1f, 0xff, 0x1f, 0xfe, 0xf0, 0x11, 0x40,
    0x0f, 0x41, 0x6e, 0x6f, 0x74, 0x68, 0x65,
    0x72, 0x20, 0x6e, 0x65, 0x74, 0x77, 0x6f,
    0x72, 0x6b, 0xce, 0x03, 0xf5, 0x94])
SDT_DATA = bytes([
    0x42, 0xf0, 0x38, 0x1f, 0xff, 0xc1, 0x00,
    0x00, 0x1f, 0xff, 0xff, 0x00, 0x00, 0xFF,
    0x90, 0x11, 0x48, 0x0f, 0x01, 0x08, 0x50,
    0x72, 0x6f, 0x76, 0x69, 0x64, 0x65, 0x72,
    0x04, 0x4e, 0x61, 0x6d, 0x65, 0x00, 0x01,
    0xFF, 0xB0, 0x11, 0x48, 0x0f, 0x01, 0x08,
    0x50, 0x72, 0x6f, 0x76, 0x69, 0x64, 0x65,
    0x72, 0x04, 0x4e, 0x61, 0x6d, 0x65, 0x25,
    0xe5, 0x02, 0xd9])
STT_DATA = bytes([
    0xcd, 0xf0, 0x11, 0x00, 0x00, 0xc1, 0x00,
    0x00, 0x00, 0x23, 0xb4, 0xe6, 0x5C, 0x0c,
    0xc0, 0x00, 0xc4, 0x86, 0x56, 0xa5])


def _corrupt_crc(section):
    data = bytearray(section.data)
    data[section.section_length - 1] += 1
    section.data = bytes(data)


def test_mpegts_pat():
    """mpegts.c test_mpegts_pat."""
    programs = [si.PatProgram(i, 0x30 + i) for i in range(2)]
    section = si.section_from_pat(programs, 0)
    pat = section.get_pat()
    assert len(pat) == 2
    for i, program in enumerate(pat):
        assert program.program_number == i
        assert program.network_or_program_map_PID == 0x30 + i
    assert section.packetize() == PAT_DATA
    _corrupt_crc(section)
    assert section.get_pat() is None  # bad CRC


def test_mpegts_pmt():
    """mpegts.c test_mpegts_pmt."""
    pmt = si.Pmt(pcr_pid=0x1FFF, program_number=1)
    pmt.descriptors.append(si.descriptor_from_registration("HDMV"))
    for i in range(2):
        st = si.PmtStream(stream_type=0x1B, pid=0x40 + i)  # H.264
        st.descriptors.append(si.descriptor_from_registration("HDMV"))
        pmt.streams.append(st)
    section = si.section_from_pmt(pmt, 0x30)
    parsed = section.get_pmt()
    assert parsed.pcr_pid == 0x1FFF
    assert parsed.program_number == 1
    assert len(parsed.descriptors) == 1
    assert len(parsed.streams) == 2
    desc = si.find_descriptor(parsed.descriptors,
                              si.DESC_REGISTRATION)
    assert desc is not None
    for i, st in enumerate(parsed.streams):
        assert st.stream_type == 0x1B
        assert st.pid == 0x40 + i
        assert len(st.descriptors) == 1
        assert si.find_descriptor(st.descriptors,
                                  si.DESC_REGISTRATION) is not None
    assert section.packetize() == PMT_DATA
    _corrupt_crc(section)
    assert section.get_pmt() is None


def test_mpegts_nit():
    """mpegts.c test_mpegts_nit."""
    nit = si.Nit(actual_network=True, network_id=0x1FFF)
    nit.descriptors.append(
        si.descriptor_from_dvb_network_name("Network name"))
    for i in range(2):
        st = si.NitStream(transport_stream_id=0x1FFF,
                          original_network_id=0x1FFE)
        st.descriptors.append(
            si.descriptor_from_dvb_network_name("Another network"))
        nit.streams.append(st)
    section = si.section_from_nit(nit)
    parsed = section.get_nit()
    assert len(parsed.descriptors) == 1
    assert len(parsed.streams) == 2
    assert parsed.actual_network is True
    assert parsed.network_id == 0x1FFF
    desc = si.find_descriptor(parsed.descriptors,
                              si.DESC_DVB_NETWORK_NAME)
    assert si.descriptor_parse_dvb_network_name(desc) \
        == "Network name"
    for st in parsed.streams:
        assert st.transport_stream_id == 0x1FFF
        assert st.original_network_id == 0x1FFE
        desc = si.find_descriptor(st.descriptors,
                                  si.DESC_DVB_NETWORK_NAME)
        assert si.descriptor_parse_dvb_network_name(desc) \
            == "Another network"
    assert section.packetize() == NIT_DATA
    _corrupt_crc(section)
    assert section.get_nit() is None


def test_mpegts_sdt():
    """mpegts.c test_mpegts_sdt."""
    sdt = si.Sdt(actual_ts=True, original_network_id=0x1FFF,
                 transport_stream_id=0x1FFF)
    for i in range(2):
        svc = si.SdtService(
            service_id=i, EIT_schedule_flag=True,
            EIT_present_following_flag=True,
            running_status=si.RUNNING_STATUS_RUNNING + i,
            free_CA_mode=True)
        svc.descriptors.append(si.descriptor_from_dvb_service(
            si.DVB_SERVICE_DIGITAL_TELEVISION, "Name", "Provider"))
        sdt.services.append(svc)
    section = si.section_from_sdt(sdt)
    parsed = section.get_sdt()
    assert len(parsed.services) == 2
    assert parsed.actual_ts is True
    assert parsed.original_network_id == 0x1FFF
    assert parsed.transport_stream_id == 0x1FFF
    for i, svc in enumerate(parsed.services):
        assert svc.service_id == i
        assert svc.EIT_schedule_flag is True
        assert svc.EIT_present_following_flag is True
        assert svc.running_status == si.RUNNING_STATUS_RUNNING + i
        assert svc.free_CA_mode is True
        desc = si.find_descriptor(svc.descriptors,
                                  si.DESC_DVB_SERVICE)
        assert si.descriptor_parse_dvb_service(desc) is not None
    assert section.packetize() == SDT_DATA
    _corrupt_crc(section)
    assert section.get_sdt() is None


def test_mpegts_atsc_stt():
    """mpegts.c test_mpegts_atsc_stt."""
    section = si.section_new(0x1FFB, STT_DATA)
    stt = section.get_atsc_stt()
    assert stt is not None
    assert stt.protocol_version == 0
    assert stt.system_time == 0x23B4E65C
    assert stt.gps_utc_offset == 12
    assert stt.ds_status == 1
    assert stt.ds_dayofmonth == 0
    assert stt.ds_hour == 0
    dt = stt.datetime_utc()
    assert (dt.day, dt.month, dt.year) == (30, 12, 1998)
    assert (dt.hour, dt.minute, dt.second) == (13, 0, 0)


def test_mpegts_descriptors():
    """mpegts.c test_mpegts_descriptors: registration 0x05."""
    desc = si.descriptor_from_registration("HDMV")
    assert desc.length == 4
    assert desc.tag == 0x05
    assert desc.data == bytes([0x05, 0x04, 0x48, 0x44, 0x4d, 0x56])


def test_mpegts_dvb_descriptors():
    """mpegts.c test_mpegts_dvb_descriptors."""
    desc = si.descriptor_from_dvb_network_name("Name")
    assert desc.length == 4 and desc.tag == 0x40
    assert desc.data == bytes([0x40, 0x04, 0x4e, 0x61, 0x6d, 0x65])
    assert si.descriptor_parse_dvb_network_name(desc) == "Name"
    assert si.descriptor_from_dvb_network_name("A" * 256) is None

    desc = si.descriptor_from_dvb_service(
        si.DVB_SERVICE_DIGITAL_TELEVISION, "Name", "Provider")
    assert desc.length == 15 and desc.tag == 0x48
    assert desc.data == bytes([
        0x48, 0x0f, 0x01, 0x08, 0x50, 0x72, 0x6f,
        0x76, 0x69, 0x64, 0x65, 0x72, 0x04, 0x4e,
        0x61, 0x6d, 0x65])
    stype, name, provider = si.descriptor_parse_dvb_service(desc)
    assert stype == si.DVB_SERVICE_DIGITAL_TELEVISION
    assert name == "Name" and provider == "Provider"

    desc = si.descriptor_from_dvb_service(
        si.DVB_SERVICE_DIGITAL_TELEVISION)
    assert desc.length == 3 and desc.tag == 0x48
    assert si.descriptor_parse_dvb_service(desc) is not None

    long_string = "A" * 256
    assert si.descriptor_from_dvb_service(
        si.DVB_SERVICE_DIGITAL_TELEVISION, long_string, None) is None
    assert si.descriptor_from_dvb_service(
        si.DVB_SERVICE_DIGITAL_TELEVISION, None, long_string) is None


def test_scte_sit_null_command():
    """mpegts.c test_scte_sit, NULL command part."""
    sit = si.ScteSit(tier=123, pts_adjustment=0x1FEDCBA12,
                     splice_command_type=si.SCTE_SPLICE_COMMAND_NULL)
    section = si.section_from_scte_sit(sit, 456)
    assert section.short_section
    data = section.packetize()
    assert data is not None
    parsed = section.get_scte_sit()
    assert parsed is not None
    assert parsed.encrypted_packet is False
    assert parsed.pts_adjustment == 0x1FEDCBA12
    assert parsed.tier == 123
    assert parsed.splice_command_type == si.SCTE_SPLICE_COMMAND_NULL


def test_scte_sit_insert_command():
    """mpegts.c test_scte_sit, INSERT command part."""
    sit = si.ScteSit(tier=123, pts_adjustment=0x1FEDCBA12,
                     splice_command_type=si.SCTE_SPLICE_COMMAND_INSERT)
    ev = si.ScteSpliceEvent(
        insert_event=True, splice_event_id=4285,
        program_splice_flag=True, duration_flag=True,
        splice_immediate_flag=False,
        program_splice_time_specified=True,
        program_splice_time=0x1FDECBA12,
        break_duration_auto_return=True, break_duration=590000,
        unique_program_id=4256, avail_num=2, avails_expected=2)
    sit.splices.append(ev)
    section = si.section_from_scte_sit(sit, 456)
    assert section.short_section
    assert section.packetize() is not None
    parsed = section.get_scte_sit()
    assert parsed is not None
    assert parsed.encrypted_packet is False
    assert parsed.pts_adjustment == 0x1FEDCBA12
    assert parsed.tier == 123
    assert parsed.splice_command_type == si.SCTE_SPLICE_COMMAND_INSERT
    ev = parsed.splices[0]
    assert ev.insert_event is True
    assert ev.splice_event_id == 4285
    assert ev.program_splice_flag is True
    assert ev.duration_flag is True
    assert ev.splice_immediate_flag is False
    assert ev.program_splice_time_specified is True
    assert ev.program_splice_time == 0x1FDECBA12
    assert ev.break_duration_auto_return is True
    assert ev.break_duration == 590000
    assert ev.unique_program_id == 4256
    assert ev.avail_num == 2
    assert ev.avails_expected == 2


def test_section_new_roundtrip():
    """Sections wrapped from raw bytes keep their header fields."""
    section = si.section_new(0x30, PMT_DATA)
    assert section.table_id == 0x02
    assert not section.short_section
    assert section.subtable_extension == 1
    assert section.version_number == 0
    assert section.current_next_indicator
    pmt = section.get_pmt()
    assert pmt is not None and pmt.program_number == 1
