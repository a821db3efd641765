// Unreal Engine 5 wrapper for the ALICE-Codec TPU C ABI (libalice_codec.so).
//
// Mirrors the reference UE5 binding surface (reference:
// bindings/ue5/AliceCodec.h over src/ffi.rs's 20 functions): extern-C
// prototypes plus RAII wrappers FWavelet1D / FFrameEncoder / FEncodedChunk.

#pragma once

#include <cstdint>
#include <vector>

extern "C" {
// Wavelet1D (6)
void* alice_codec_wavelet1d_haar();
void* alice_codec_wavelet1d_cdf53();
void* alice_codec_wavelet1d_cdf97();
void alice_codec_wavelet1d_destroy(void* Wavelet);
void alice_codec_wavelet1d_forward(const void* Wavelet, int32_t* Data, uint32_t Len);
void alice_codec_wavelet1d_inverse(const void* Wavelet, int32_t* Data, uint32_t Len);

// FrameEncoder (3)
void* alice_codec_encoder_create(uint8_t Quality);
void alice_codec_encoder_destroy(void* Encoder);
void* alice_codec_encode(const void* Encoder, const uint8_t* RgbData,
                         uint32_t RgbLen, uint32_t Width, uint32_t Height,
                         uint32_t Frames);

// Decode (1)
uint8_t* alice_codec_decode(const void* Chunk, uint32_t* OutLen);

// EncodedChunk (6)
void alice_codec_chunk_destroy(void* Chunk);
uint8_t* alice_codec_chunk_to_bytes(const void* Chunk, uint32_t* OutLen);
void* alice_codec_chunk_from_bytes(const uint8_t* Data, uint32_t Len);
uint32_t alice_codec_chunk_width(const void* Chunk);
uint32_t alice_codec_chunk_height(const void* Chunk);
uint32_t alice_codec_chunk_frames(const void* Chunk);

// Metrics (1)
double alice_codec_psnr(const uint8_t* A, const uint8_t* B, uint32_t Len);

// Utility (3)
void alice_codec_data_free(uint8_t* Ptr, uint32_t Len);
void alice_codec_string_free(char* Str);
char* alice_codec_version();
}

namespace AliceCodecTpu
{

/** RAII 1D wavelet (haar / cdf53 / cdf97). */
class FWavelet1D
{
public:
	enum class EKind { Haar, Cdf53, Cdf97 };

	explicit FWavelet1D(EKind Kind)
	{
		switch (Kind)
		{
		case EKind::Haar: Handle = alice_codec_wavelet1d_haar(); break;
		case EKind::Cdf53: Handle = alice_codec_wavelet1d_cdf53(); break;
		case EKind::Cdf97: Handle = alice_codec_wavelet1d_cdf97(); break;
		}
	}
	~FWavelet1D() { alice_codec_wavelet1d_destroy(Handle); }
	FWavelet1D(const FWavelet1D&) = delete;
	FWavelet1D& operator=(const FWavelet1D&) = delete;

	void Forward(int32_t* Data, uint32_t Len) const
	{
		alice_codec_wavelet1d_forward(Handle, Data, Len);
	}
	void Inverse(int32_t* Data, uint32_t Len) const
	{
		alice_codec_wavelet1d_inverse(Handle, Data, Len);
	}

private:
	void* Handle = nullptr;
};

/** RAII compressed-chunk handle. */
class FEncodedChunk
{
public:
	explicit FEncodedChunk(void* InHandle) : Handle(InHandle) {}
	~FEncodedChunk() { alice_codec_chunk_destroy(Handle); }
	FEncodedChunk(const FEncodedChunk&) = delete;
	FEncodedChunk& operator=(const FEncodedChunk&) = delete;

	bool IsValid() const { return Handle != nullptr; }
	uint32_t Width() const { return alice_codec_chunk_width(Handle); }
	uint32_t Height() const { return alice_codec_chunk_height(Handle); }
	uint32_t Frames() const { return alice_codec_chunk_frames(Handle); }

	std::vector<uint8_t> ToBytes() const
	{
		uint32_t Len = 0;
		uint8_t* Ptr = alice_codec_chunk_to_bytes(Handle, &Len);
		std::vector<uint8_t> Out(Ptr, Ptr + Len);
		alice_codec_data_free(Ptr, Len);
		return Out;
	}

	std::vector<uint8_t> Decode() const
	{
		uint32_t Len = 0;
		uint8_t* Ptr = alice_codec_decode(Handle, &Len);
		if (!Ptr) return {};
		std::vector<uint8_t> Out(Ptr, Ptr + Len);
		alice_codec_data_free(Ptr, Len);
		return Out;
	}

	static FEncodedChunk FromBytes(const uint8_t* Data, uint32_t Len)
	{
		return FEncodedChunk(alice_codec_chunk_from_bytes(Data, Len));
	}

	void* Handle = nullptr;
};

/** RAII frame encoder. */
class FFrameEncoder
{
public:
	explicit FFrameEncoder(uint8_t Quality = 90)
		: Handle(alice_codec_encoder_create(Quality))
	{
	}
	~FFrameEncoder() { alice_codec_encoder_destroy(Handle); }
	FFrameEncoder(const FFrameEncoder&) = delete;
	FFrameEncoder& operator=(const FFrameEncoder&) = delete;

	FEncodedChunk Encode(const uint8_t* Rgb, uint32_t Len, uint32_t Width,
	                     uint32_t Height, uint32_t Frames) const
	{
		return FEncodedChunk(
			alice_codec_encode(Handle, Rgb, Len, Width, Height, Frames));
	}

private:
	void* Handle = nullptr;
};

}  // namespace AliceCodecTpu
